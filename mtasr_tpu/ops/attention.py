"""Fused multi-head attention for TPU.

Replaces the reference's SDPA/FlashAttention-2 dispatch
(/root/reference/models/llama_modules.py:228-331) with a single XLA-fusable
formulation: bf16 matmuls on the MXU, float32 softmax, GQA via logical head
grouping (no materialized repeat_kv), additive bias/mask support (used by the
WavLM gated relative position bias and by causal/padding masks).

Layout convention: q [B, T, Hq, D], k/v [B, S, Hkv, D] — heads in axis 2 so
the batch/time dims stay contiguous for sharding along ('data', None, 'model').
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # avoid actual -inf so fully-masked rows don't produce NaN


def dot_product_attention(
    q: jax.Array,                 # [B, T, Hq, D]
    k: jax.Array,                 # [B, S, Hkv, D]
    v: jax.Array,                 # [B, S, Hkv, D]
    *,
    bias: Optional[jax.Array] = None,   # broadcastable to [B, Hq, T, S]
    mask: Optional[jax.Array] = None,   # bool, broadcastable to [B, Hq, T, S]; True=attend
    scale: Optional[float] = None,
) -> jax.Array:
    """Returns [B, T, Hq, D]."""
    B, T, Hq, D = q.shape
    _, S, Hkv, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    groups = Hq // Hkv

    # [B, T, Hkv, G, D] x [B, S, Hkv, D] -> [B, Hkv, G, T, S]
    qg = q.reshape(B, T, Hkv, groups, D)
    logits = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = logits.reshape(B, Hq, T, S)

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs.astype(v.dtype)

    probs_g = probs.reshape(B, Hkv, groups, T, S)
    out = jnp.einsum("bhgts,bshd->bthgd", probs_g, v)
    return out.reshape(B, T, Hq, D)


def make_causal_mask(T: int, S: int, offset: int = 0, dtype=jnp.bool_) -> jax.Array:
    """[T, S] lower-triangular mask; query position i attends to key j when
    j <= i + offset. `offset = S - T` yields standard decode-step masking."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(S)[None, :]
    return (j <= i + offset).astype(dtype)
