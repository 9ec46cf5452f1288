"""Rotary position embeddings.

Matches the reference's vendored HF implementation
(/root/reference/models/llama_modules.py:105-197): float32 cos/sin,
rotate-half formulation, and llama3-style frequency rescaling
(rope_scaling={"rope_type": "llama3", ...}).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_rope_freqs(head_dim: int, rope_theta: float,
                       rope_scaling: Optional[dict] = None) -> Tuple[np.ndarray, float]:
    """Returns (inv_freq [head_dim//2], attention_scaling)."""
    inv_freq = 1.0 / (rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    attention_scaling = 1.0
    if rope_scaling is not None:
        rope_type = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
        if rope_type == "llama3":
            factor = rope_scaling["factor"]
            low = rope_scaling["low_freq_factor"]
            high = rope_scaling["high_freq_factor"]
            old_len = rope_scaling["original_max_position_embeddings"]
            low_freq_wavelen = old_len / low
            high_freq_wavelen = old_len / high
            wavelen = 2 * math.pi / inv_freq
            # wavelen < high_freq_wavelen: keep; > low_freq_wavelen: /factor
            inv_freq_llama = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
            smooth = (old_len / wavelen - low) / (high - low)
            smoothed = (1 - smooth) * inv_freq_llama / factor + smooth * inv_freq_llama
            is_medium = ~(wavelen < high_freq_wavelen) & ~(wavelen > low_freq_wavelen)
            inv_freq = np.where(is_medium, smoothed, inv_freq_llama)
        elif rope_type == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        elif rope_type == "default":
            pass
        else:
            raise NotImplementedError(f"rope_type={rope_type}")
    return inv_freq.astype(np.float32), attention_scaling


def rope_cos_sin(inv_freq: jax.Array, position_ids: jax.Array,
                 attention_scaling: float = 1.0,
                 dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """position_ids: [..., T] int -> cos/sin [..., T, head_dim]."""
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)                  # [..., T, D]
    cos = jnp.cos(emb) * attention_scaling
    sin = jnp.sin(emb) * attention_scaling
    return cos.astype(dtype), sin.astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary_emb(q: jax.Array, k: jax.Array,
                     cos: jax.Array, sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """q/k: [B, T, H, D] (heads in axis 2); cos/sin: [B, T, D] or [T, D]."""
    if cos.ndim == q.ndim - 1:
        cos = cos[..., None, :]   # broadcast over heads: [B, T, 1, D]
        sin = sin[..., None, :]
    q_rot = q * cos + _rotate_half(q) * sin
    k_rot = k * cos + _rotate_half(k) * sin
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)
