"""Speaker separator: pre-projection -> stacked LSTM -> K symmetric branches.

Re-design of /root/reference/models/separator.py (Separator,
StackedCustomLSTM, CustomLSTMCell). The reference's Python `for t in range(T)`
time loop becomes a lax.scan (ops/lstm.py); everything else is the same
architecture: Linear(in->hidden)+ReLU+LN -> 2-layer LSTM (per-step dropout)
-> LN -> K branches of [Linear+ReLU(+Dropout), Linear+ReLU(+LN)] with a tiny
per-branch bias offset to break symmetry (separator.py:147-148).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mtasr_tpu.models.layers import (
    dropout, layer_norm, layer_norm_init, linear, linear_init,
)
from mtasr_tpu.ops.lstm import lstm_scan


def _xavier_linear(key, in_dim, out_dim, dtype):
    wkey, _ = jax.random.split(key)
    # host-side constant (np, not jnp): keeps init traceable under jit
    bound = float(np.sqrt(6.0 / (in_dim + out_dim)))
    return {"weight": jax.random.uniform(wkey, (out_dim, in_dim), dtype,
                                         -bound, bound),
            "bias": jnp.zeros((out_dim,), dtype)}


def init_separator_params(key: jax.Array, in_dim: int, hidden_size: int,
                          talker_numbers: int, num_layers: int = 2,
                          break_symmetry_eps: float = 1e-3,
                          dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 4 + num_layers + 2 * talker_numbers))
    p: dict = {
        "pre_proj": _xavier_linear(next(keys), in_dim, hidden_size, dtype),
        "pre_ln": layer_norm_init(hidden_size, dtype),
        "post_ln": layer_norm_init(hidden_size, dtype),
        "lstm": {"cells": {}},
        "sep_branches": {},
    }
    for l in range(num_layers):
        cin = hidden_size
        # torch Linear(input+hidden -> 4H) default init
        p["lstm"]["cells"][str(l)] = linear_init(
            next(keys), cin + hidden_size, 4 * hidden_size, dtype=dtype)
    for b in range(talker_numbers):
        lin1 = _xavier_linear(next(keys), hidden_size, hidden_size, dtype)
        lin2 = _xavier_linear(next(keys), hidden_size, in_dim, dtype)
        lin2["bias"] = lin2["bias"] + break_symmetry_eps * b
        p["sep_branches"][str(b)] = {
            "0": lin1, "2": lin2, "ln": layer_norm_init(in_dim, dtype),
        }
    return p


def separator_forward(params: dict, x: jax.Array, talker_numbers: int,
                      num_layers: int = 2, lstm_dropout: float = 0.2,
                      deterministic: bool = True,
                      rng: Optional[jax.Array] = None) -> List[jax.Array]:
    """x: [B, T, in_dim] mixed 50 Hz encoding -> K x [B, T, in_dim]."""
    y = linear(params["pre_proj"], x)
    y = jax.nn.relu(y)
    y = layer_norm(params["pre_ln"], y)

    for l in range(num_layers):
        cell = params["lstm"]["cells"][str(l)]
        y = lstm_scan(y, cell["weight"].T, cell["bias"])
        if lstm_dropout > 0 and not deterministic and rng is not None:
            rng, sub = jax.random.split(rng)
            y = dropout(y, lstm_dropout, sub, deterministic)

    y = layer_norm(params["post_ln"], y)

    outs = []
    for b in range(talker_numbers):
        bp = params["sep_branches"][str(b)]
        h = jax.nn.relu(linear(bp["0"], y))
        h = jax.nn.relu(linear(bp["2"], h))
        h = layer_norm(bp["ln"], h)
        outs.append(h)
    return outs
