"""Normalization ops.

RMSNorm matches the reference LlamaRMSNorm semantics
(/root/reference/models/llama_modules.py:82-99): compute in float32,
cast back to the input dtype, then scale by the weight.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    input_dtype = x.dtype
    xf = x.astype(jnp.float32)
    variance = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(variance + eps)
    return weight * xf.astype(input_dtype)
