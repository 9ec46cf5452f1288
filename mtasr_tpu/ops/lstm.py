"""LSTM via lax.scan — the TPU replacement for the reference separator's
per-timestep Python loop (/root/reference/models/separator.py:42-59, called
out in SURVEY.md as the single slowest reference module).

Gate math matches CustomLSTMCell exactly (separator.py:6-24): one fused
Linear over [x_t, h_t] producing 4H gates split as (i, f, g, o):
  i,f,o = sigmoid; g = tanh; c = f*c + i*g; h = o*tanh(c).

The time loop is a lax.scan whose body is one [B, In+H] x [In+H, 4H] matmul
— large, static, MXU-friendly. Inter-layer LayerNorm/dropout hooks mirror
StackedCustomLSTM (separator.py:27-59).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


def lstm_scan(x: jax.Array, w: jax.Array, b: jax.Array,
              h0: Optional[jax.Array] = None,
              c0: Optional[jax.Array] = None) -> jax.Array:
    """Single-layer LSTM.

    x: [B, T, In]; w: [In+H, 4H] (input-major, matching torch Linear.weight.T);
    b: [4H]. Returns outputs [B, T, H].
    Gate order along the 4H axis is (i, f, g, o), same as torch .chunk(4).
    """
    B, T, _ = x.shape
    H = w.shape[1] // 4
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), x.dtype)

    w_x = w[:-H]   # [In, 4H]
    w_h = w[-H:]   # [H, 4H]
    # Hoist the input projection out of the scan: one big [B*T, In]x[In,4H]
    # matmul on the MXU instead of T small ones.
    x_proj = jnp.einsum("bti,ih->bth", x, w_x) + b   # [B, T, 4H]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_h
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
    (_, _), ys = jax.lax.scan(step, (h0, c0), xs)
    return jnp.swapaxes(ys, 0, 1)    # [B, T, H]


def stacked_lstm(x: jax.Array,
                 weights: List[jax.Array], biases: List[jax.Array],
                 ln_scales: Optional[List[jax.Array]] = None,
                 ln_biases: Optional[List[jax.Array]] = None,
                 dropout_rate: float = 0.0,
                 dropout_rng: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
    """Stacked LSTM matching StackedCustomLSTM's inter-layer wiring.

    NOTE on semantics: the reference interleaves layers *inside* the time loop,
    but with zero inter-layer feedback that is mathematically identical to
    running each layer over the full sequence (layer l at time t only consumes
    layer l-1 at time t and its own state at t-1). Per-timestep dropout between
    layers is approximated by per-position dropout on the full sequence —
    identical in distribution (i.i.d. per (t, feature) element).
    """
    y = x
    for layer, (w, b) in enumerate(zip(weights, biases)):
        y = lstm_scan(y, w, b)
        if ln_scales is not None:
            mean = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.var(y, axis=-1, keepdims=True)
            y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y * ln_scales[layer] + ln_biases[layer]
        if dropout_rate > 0.0 and not deterministic:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, y.shape)
            y = jnp.where(keep, y / (1.0 - dropout_rate), 0.0)
    return y
