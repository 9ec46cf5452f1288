"""Tiled flash attention (online softmax) for TPU, in Pallas.

Replaces the reference's SDPA/FlashAttention-2 dependency kernels
(/root/reference/models/llama_modules.py:308-316, SURVEY.md §2 native-code
note) with a TPU-native kernel:

* grid (B, Hq, T_blocks, S_blocks); the S dimension is the innermost
  sequential grid axis, so running max / denominator / accumulator live in
  VMEM scratch across S steps — no [T, S] score matrix is ever materialized
* MXU matmuls on [block_q, D] x [D, block_k] tiles with f32 accumulation
* GQA via block index mapping (kv head = q head // group) — no repeat_kv
* optional per-key-length masking (padding) and causal masking with offset
* optional WavLM gated relative-position bias, composed INSIDE the kernel
  from the shared [H, T, S] table and the per-(batch, head, query) gate so
  the [B, H, T, S] gated bias is never materialized in HBM

Backward: custom_vjp that recomputes attention with the XLA reference path
(exact same math) — flash is primarily for inference/prefill; training
defaults to the XLA fused path where autodiff memory is managed by remat.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtasr_tpu.ops.attention import dot_product_attention

NEG_INF = -1e30


def _flash_kernel(kv_len_ref, q_ref, k_ref, v_ref, pos_bias_ref, gate_ref,
                  o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, causal: bool, q_offset: int,
                  block_q: int, block_k: int, n_heads: int,
                  with_bias: bool):
    """Inputs flattened to [B*H, T, D] so every block's trailing dims are
    hardware-tileable. Grid: (B*Hq, T_blocks, S_blocks)."""
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                               # [bq, D]
    k = k_ref[0]                               # [bk, D]
    v = v_ref[0]

    # zero out-of-range / padded key rows: ragged tail blocks contain
    # uninitialized data, and even 0-weighted NaNs would poison p @ v
    kv_len = kv_len_ref[pl.program_id(0) // n_heads]
    row_ids = j * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                     (block_k, 1), 0)
    row_ok = row_ids < kv_len
    k = jnp.where(row_ok, k, 0.0)
    v = jnp.where(row_ok, v, 0.0)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    if with_bias:
        pb = pos_bias_ref[0].astype(jnp.float32)            # [bq, bk]
        g = gate_ref[0, 0, :].astype(jnp.float32)           # [bq]
        s = s + g[:, None] * pb

    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                 (block_q, block_k), 1)
    valid = col < kv_len
    if causal:
        row = (pl.program_id(1) * block_q + q_offset
               + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))
        valid = valid & (col <= row)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[:, :1]                                    # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                                   # [bq, bk]
    corr = jnp.exp(m_prev - m_new)                           # [bq, 1]

    l_new = corr * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = corr * acc_scr[:] + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_j - 1)
    def _():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _flash_forward(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
                   block_q, block_k, interpret=False):
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    block_q = min(block_q, T)
    block_k = min(block_k, S)

    # flatten heads into the leading grid dim: [B, T, H, D] -> [B*H, T, D]
    q_f = q.transpose(0, 2, 1, 3).reshape(B * Hq, T, D)
    k_f = k.transpose(0, 2, 1, 3).reshape(B * Hkv, S, D)
    v_f = v.transpose(0, 2, 1, 3).reshape(B * Hkv, S, D)

    grid = (B * Hq, pl.cdiv(T, block_q), pl.cdiv(S, block_k))

    with_bias = pos_bias is not None
    if kv_lens is None:
        kv_lens = jnp.full((B,), S, jnp.int32)
    if with_bias:
        gate_f = gate.reshape(B * Hq, 1, T)
    else:
        pos_bias = jnp.zeros((1, 8, 128), q.dtype)
        gate_f = jnp.zeros((1, 1, 128), q.dtype)

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, q_offset=q_offset,
        block_q=block_q, block_k=block_k, n_heads=Hq, with_bias=with_bias)

    # NOTE: with PrefetchScalarGridSpec, index maps receive the scalar
    # prefetch refs as trailing args (the kv_lens ref here).
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda bh, i, j, kv: (bh, i, 0)),
        pl.BlockSpec((1, block_k, D),
                     lambda bh, i, j, kv:
                     (bh // Hq * Hkv + (bh % Hq) // group, j, 0)),
        pl.BlockSpec((1, block_k, D),
                     lambda bh, i, j, kv:
                     (bh // Hq * Hkv + (bh % Hq) // group, j, 0)),
    ]
    if with_bias:
        in_specs += [
            pl.BlockSpec((1, block_q, block_k),
                         lambda bh, i, j, kv: (bh % Hq, i, j)),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j, kv: (bh, 0, i)),
        ]
    else:
        in_specs += [
            pl.BlockSpec((1, 8, 128), lambda bh, i, j, kv: (0, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda bh, i, j, kv: (0, 0, 0)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D),
                               lambda bh, i, j, kv: (bh, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Hq, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q_f, k_f, v_f, pos_bias, gate_f)
    return out.reshape(B, Hq, T, D).transpose(0, 2, 1, 3)


def _reference(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset):
    B, T, Hq, D = q.shape
    S = k.shape[1]
    bias = None
    if pos_bias is not None:
        bias = gate[..., None].astype(jnp.float32) * \
            pos_bias[None].astype(jnp.float32)
    mask = jnp.ones((B, 1, T, S), bool)
    if kv_lens is not None:
        mask = mask & (jnp.arange(S)[None, None, None, :]
                       < kv_lens[:, None, None, None])
    if causal:
        i = jnp.arange(T)[:, None] + q_offset
        jdx = jnp.arange(S)[None, :]
        mask = mask & (jdx <= i)[None, None]
    return dot_product_attention(q, k, v, bias=bias, mask=mask, scale=scale)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
           block_q, block_k, interpret):
    return _flash_forward(q, k, v, kv_lens, pos_bias, gate, scale, causal,
                          q_offset, block_q, block_k, interpret)


def _flash_fwd(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
               block_q, block_k, interpret):
    out = _flash_forward(q, k, v, kv_lens, pos_bias, gate, scale, causal,
                         q_offset, block_q, block_k, interpret)
    return out, (q, k, v, kv_lens, pos_bias, gate)


def _flash_bwd(scale, causal, q_offset, block_q, block_k, interpret, res,
               g_out):
    q, k, v, kv_lens, pos_bias, gate = res
    def f(q, k, v, pos_bias, gate):
        return _reference(q, k, v, kv_lens, pos_bias, gate, scale, causal,
                          q_offset)
    _, vjp = jax.vjp(f, q, k, v, pos_bias, gate)
    dq, dk, dv, dpb, dg = vjp(g_out)
    return dq, dk, dv, None, dpb, dg


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,                      # [B, T, Hq, D]
    k: jax.Array,                      # [B, S, Hkv, D]
    v: jax.Array,
    *,
    kv_lens: Optional[jax.Array] = None,   # [B] valid key count
    pos_bias: Optional[jax.Array] = None,  # [H, T, S] shared rel-pos table
    gate: Optional[jax.Array] = None,      # [B, H, T] per-query gate
    scale: Optional[float] = None,
    causal: bool = False,
    q_offset: int = 0,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention; returns [B, T, Hq, D]. With pos_bias+gate the score
    gets `gate[b,h,i] * pos_bias[h,i,j]` added (WavLM gated rel-pos)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if pos_bias is not None and gate is None:
        gate = jnp.ones((q.shape[0], q.shape[2], q.shape[1]), q.dtype)
    return _flash(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
                  block_q, block_k, interpret)
