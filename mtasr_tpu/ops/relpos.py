"""WavLM gated relative position bias helpers.

Bucket math mirrors HF WavLMAttention._relative_positions_bucket (the
reference vendors WavLM wholesale; see
/root/reference/models/modeling_wavlm.py:318-465 which reuses the HF encoder
layers). Computed once per forward in float32 and reused across all layers
(only layer 0 owns the embedding table; later layers receive the bias).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def relative_position_bucket(query_length: int, key_length: int,
                             num_buckets: int, max_distance: int) -> np.ndarray:
    """Returns [query_length, key_length] int32 bucket ids (host-side numpy:
    depends only on static lengths, so it folds into the compiled program as a
    constant)."""
    context_position = np.arange(query_length, dtype=np.int64)[:, None]
    memory_position = np.arange(key_length, dtype=np.int64)[None, :]
    relative_position = memory_position - context_position

    nb = num_buckets // 2
    relative_buckets = (relative_position > 0).astype(np.int64) * nb
    rp = np.abs(relative_position)

    max_exact = nb // 2
    is_small = rp < max_exact

    with np.errstate(divide="ignore"):
        rp_large = np.log(np.maximum(rp, 1).astype(np.float64) / max_exact)
    rp_large = rp_large / math.log(max_distance / max_exact)
    rp_large = rp_large * (nb - max_exact)
    rp_large = (max_exact + rp_large).astype(np.int64)
    rp_large = np.minimum(rp_large, nb - 1)

    relative_buckets = relative_buckets + np.where(is_small, rp, rp_large)
    return relative_buckets.astype(np.int32)


def gated_position_bias(position_bias: jnp.ndarray, hidden_states: jnp.ndarray,
                        gru_w: jnp.ndarray, gru_b: jnp.ndarray,
                        gru_const: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """HF WavLMAttention gating: per-(batch, head, query) scalar gate applied
    to the shared [H, T, S] bias.

    hidden_states: [B, T, E]; gru_w: [head_dim, 8]; gru_const: [H] (squeezed
    from torch's [1, H, 1, 1]). Returns [B, H, T, S].
    """
    B, T, E = hidden_states.shape
    head_dim = E // num_heads
    gh = hidden_states.reshape(B, T, num_heads, head_dim)
    proj = jnp.einsum("bthd,de->bthe", gh, gru_w) + gru_b   # [B, T, H, 8]
    proj = proj.reshape(B, T, num_heads, 2, 4).sum(-1)       # [B, T, H, 2]
    gates = jnp.asarray(jnp.reciprocal(1 + jnp.exp(-proj)))  # sigmoid
    gate_a, gate_b = gates[..., 0], gates[..., 1]            # [B, T, H]
    gate_out = gate_a * (gate_b * gru_const[None, None, :] - 1.0) + 2.0
    # -> [B, H, T, 1] * [1, H, T, S]
    return gate_out.transpose(0, 2, 1)[:, :, :, None] * position_bias[None]
