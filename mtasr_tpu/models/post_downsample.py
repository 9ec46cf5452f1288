"""WavLM post-downsampler: 2x (Conv1d stride-2 + GLU + dropout) = 4x time
reduction with length recompute.

Re-design of /root/reference/models/down_sampling.py (WavLMPostDownsample).
The reference imports it but its only call site is commented out
(modeling...llama.py:890); provided here for completeness behind
`use_post_downsample` when composing custom stacks.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.models.layers import conv1d, conv1d_init, dropout


def init_post_downsample_params(key: jax.Array, dim: int, kernel: int = 3,
                                dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, dim, 2 * dim, kernel, dtype=dtype),
        "conv2": conv1d_init(k2, dim, 2 * dim, kernel, dtype=dtype),
    }


def post_downsample(p: dict, x: jax.Array,
                    lengths: Optional[jax.Array] = None,
                    kernel: int = 3, stride: int = 2,
                    drop_rate: float = 0.0,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True
                    ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """x: [B, T, D] -> [B, ~T/4, D]; lengths updated with the conv formula
    floor((L + 2p - k)/s) + 1."""
    pad = kernel // 2
    for i, name in enumerate(("conv1", "conv2")):
        h = conv1d(p[name], x, stride=stride, padding=pad)
        a, b = jnp.split(h, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        if drop_rate > 0 and not deterministic and rng is not None:
            rng, sub = jax.random.split(rng)
            x = dropout(x, drop_rate, sub, deterministic)
        if lengths is not None:
            lengths = (lengths + 2 * pad - kernel) // stride + 1
    return x, lengths
