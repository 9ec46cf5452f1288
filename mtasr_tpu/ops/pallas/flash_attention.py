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

Backward: FlashAttention-2-style Pallas kernels (recompute probabilities
blockwise from the saved logsumexp; never materialize [T, S] or the gated
[B, H, T, S] bias in HBM):
* kernel A — dq and the per-query bias-gate grad dg   (grid B*Hq, T, S)
* kernel B — per-q-head dk/dv, GQA group-summed in XLA (grid B*Hq, S, T)
* kernel C — the shared rel-pos table grad dpb, accumulated over the batch
  as the innermost sequential grid axis              (grid Hq, T, S, B)
Set MTASR_FLASH_XLA_BWD=1 to fall back to the XLA-recompute vjp.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtasr_tpu.ops.attention import dot_product_attention

NEG_INF = -1e30


def _flash_kernel(kv_len_ref, q_ref, k_ref, v_ref, pos_bias_ref, gate_ref,
                  o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
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
        # logsumexp saved for the backward recompute; fully-masked rows get
        # NEG_INF (the backward re-applies the validity mask so exp(s-lse)
        # is never trusted there)
        lse = m_scr[:, :1] + jnp.log(jnp.maximum(l_scr[:, :1], 1e-30))
        lse = jnp.where(l_scr[:, :1] == 0.0, NEG_INF, lse)
        lse_ref[0, 0] = lse[:, 0]


def _flash_kernel_1s(kv_len_ref, q_ref, k_ref, v_ref, pos_bias_ref,
                     gate_ref, o_ref, lse_ref, *,
                     scale: float, causal: bool, q_offset: int,
                     block_q: int, S: int, A: int, with_bias: bool):
    """Single-S-block fast path: the whole key axis fits one block, so each
    program computes a COMPLETE softmax (no running-max scratch, no
    cross-step accumulation). Grid (Hq//A, T_blocks, B) with the batch as
    the innermost axis: the (head-group, q-block) bias slab's block index
    is constant across the b sweep, so Mosaic fetches each bias block ONCE
    per layer instead of once per (b, h) — at B=128 that alone removes
    ~2 GB/layer of HBM reads. A heads are batched per program through
    dot_generals with a single batch dim (the Mosaic tpu.matmul limit),
    amortizing per-program overhead A-fold. MHA only (the encoder);
    GQA/decoder shapes use the general kernel. (A merged-lane [B, T, H*D]
    variant with per-head lane slicing was measured SLOWER — 8.8 vs 6.7
    ms/layer — the in-register 64-of-512 lane extraction per head costs
    more than the head-split transpose this layout pays outside.)"""
    b = pl.program_id(2)
    q = q_ref[:]                               # [A, bq, D]
    kv_len = kv_len_ref[b]

    def _body(masked):
        k = k_ref[:]                           # [A, S, D]
        v = v_ref[:]
        if masked:
            # zero out-of-range key rows: slots in [kv_len, S) hold
            # stale/pad junk that would otherwise poison p @ v
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (A, S, 1), 1)
            row_ok = row_ids < kv_len
            k = jnp.where(row_ok, k, 0.0)
            v = jnp.where(row_ok, v, 0.0)

        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:                       # pow2 scales pre-fold into q
            s = s * scale

        if with_bias:
            pb = pos_bias_ref[:].astype(jnp.float32)       # [A, bq, S]
            g = gate_ref[:].astype(jnp.float32)            # [A, 1, bq]
            s = s + jnp.swapaxes(g, 1, 2) * pb

        if masked or causal:
            col = jax.lax.broadcasted_iota(jnp.int32, (A, block_q, S), 2)
            valid = col < kv_len
            if causal:
                row = (pl.program_id(1) * block_q + q_offset
                       + jax.lax.broadcasted_iota(
                           jnp.int32, (A, block_q, S), 1))
                valid = valid & (col <= row)
            s = jnp.where(valid, s, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)             # [A, bq, 1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        denom = jnp.where(l == 0.0, 1.0, l)
        out = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = (out / denom).astype(o_ref.dtype)
        lse = m + jnp.log(jnp.maximum(l, 1e-30))
        lse = jnp.where(l == 0.0, NEG_INF, lse)
        lse_ref[:] = jnp.swapaxes(lse, 1, 2)               # [A, 1, bq]

    if causal:
        _body(masked=True)
    else:
        # full-length rows (every slot in [0, S) is real data — the common
        # case for bucketed batches) skip the key zeroing and the validity
        # mask entirely: ~5 fewer VPU passes over [A, bq, S] per program
        pl.when(kv_len >= S)(lambda: _body(masked=False))
        pl.when(kv_len < S)(lambda: _body(masked=True))


def _flash_forward_1s(q, k, v, kv_lens, pos_bias, gate, scale, causal,
                      q_offset, block_q, interpret):
    """Single-S-block dispatch; preconditions checked by the caller:
    S <= block_k (one key block), Hq == Hkv (MHA)."""
    B, T, Hq, D = q.shape
    S = k.shape[1]
    # A: heads per program. VMEM estimate per program: q+k+v blocks (bf16,
    # D lane-padded to 128) and the bias slab, x2 pipeline buffers
    # (~7 MB at A=4 with S=bq=512); fits the ~16 MB/core VMEM.
    A = next(a for a in (8, 4, 2, 1) if Hq % a == 0
             and 2 * a * (3 * S * 128 + block_q * S) * 2 <= 12 * 1024 * 1024)
    block_q = min(block_q, T)

    # pre-fold an exactly-representable power-of-two scale (D=64 -> 1/8)
    # into q: one multiply over [B, T, Hq, D] (fused into the transpose)
    # instead of an in-kernel VPU pass over every [A, bq, S] score block.
    # Exact: bf16 mantissas are unchanged by pow2 scaling, and the MXU
    # forms each bf16 x bf16 product exactly in f32, so (q/8) @ k is
    # bit-identical to (q @ k)/8.
    kernel_scale = float(scale)
    frac = math.frexp(kernel_scale)[0] if kernel_scale > 0 else 0.0
    if frac == 0.5:                            # scale is a power of two
        q = q * jnp.asarray(kernel_scale, q.dtype)
        kernel_scale = 1.0
    q_f = q.transpose(0, 2, 1, 3).reshape(B * Hq, T, D)
    k_f = k.transpose(0, 2, 1, 3).reshape(B * Hq, S, D)
    v_f = v.transpose(0, 2, 1, 3).reshape(B * Hq, S, D)

    grid = (Hq // A, pl.cdiv(T, block_q), B)
    with_bias = pos_bias is not None
    if kv_lens is None:
        kv_lens = jnp.full((B,), S, jnp.int32)
    if with_bias:
        gate_f = gate.reshape(B * Hq, 1, T)
        pos_bias = pos_bias.astype(q.dtype)  # stream the table at bf16
    else:
        pos_bias = jnp.zeros((1, 8, 128), q.dtype)
        gate_f = jnp.zeros((1, 1, 128), q.dtype)

    kernel = functools.partial(
        _flash_kernel_1s, scale=kernel_scale, causal=causal, q_offset=q_offset,
        block_q=block_q, S=S, A=A, with_bias=with_bias)

    # q_f rows are h-major within b: row index = b*Hq + h. A block of
    # A rows starting at b*Hq + hg*A has block index (b*Hq//A + hg).
    Hq_over_A = Hq // A
    in_specs = [
        pl.BlockSpec((A, block_q, D),
                     lambda hg, i, b, kv: (b * Hq_over_A + hg, i, 0)),
        pl.BlockSpec((A, S, D),
                     lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, 0)),
        pl.BlockSpec((A, S, D),
                     lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, 0)),
    ]
    if with_bias:
        in_specs += [
            pl.BlockSpec((A, block_q, S), lambda hg, i, b, kv: (hg, i, 0)),
            pl.BlockSpec((A, 1, block_q),
                         lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, i)),
        ]
    else:
        in_specs += [
            pl.BlockSpec((1, 8, 128), lambda hg, i, b, kv: (0, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda hg, i, b, kv: (0, 0, 0)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((A, block_q, D),
                         lambda hg, i, b, kv: (b * Hq_over_A + hg, i, 0)),
            pl.BlockSpec((A, 1, block_q),
                         lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, i)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * Hq, T, D), q.dtype),
                   jax.ShapeDtypeStruct((B * Hq, 1, T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q_f, k_f, v_f, pos_bias, gate_f)
    return out.reshape(B, Hq, T, D).transpose(0, 2, 1, 3), lse


def _flash_forward(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
                   block_q, block_k, interpret=False):
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    block_q = min(block_q, T)
    block_k = min(block_k, S)
    if S <= block_k and Hq == Hkv:
        return _flash_forward_1s(q, k, v, kv_lens, pos_bias, gate, scale,
                                 causal, q_offset, block_q, interpret)

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
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, i, j, kv: (bh, i, 0)),
            # lse rides as [B*Hq, 1, T]: a (1, block_q) 2D block would need
            # its sublane dim (1) divisible by 8 or equal to B*Hq — the 3D
            # layout makes the last two block dims (1, block_q) legal
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j, kv: (bh, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * Hq, T, D), q.dtype),
                   jax.ShapeDtypeStruct((B * Hq, 1, T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q_f, k_f, v_f, pos_bias, gate_f)
    return out.reshape(B, Hq, T, D).transpose(0, 2, 1, 3), lse


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


# ---------------------------------------------------------------------------
# backward kernels (FlashAttention-2 recompute style)
# ---------------------------------------------------------------------------
def _recompute_p(q, k, lse_blk, kv_len, j, i_abs0, scale, causal,
                 with_bias, pb, g, block_q, block_k):
    """Blockwise probability recompute: p = exp(s - lse), masked."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if with_bias:
        s = s + g[:, None] * pb
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                 (block_q, block_k), 1)
    valid = col < kv_len
    if causal:
        row = i_abs0 + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 0)
        valid = valid & (col <= row)
    p = jnp.exp(s - lse_blk[:, None])
    return jnp.where(valid, p, 0.0), valid


def _bwd_dq_kernel(kv_len_ref, q_ref, k_ref, v_ref, pos_bias_ref, gate_ref,
                   lse_ref, delta_ref, do_ref,
                   dq_ref, dg_ref, dq_scr, dg_scr, *,
                   scale, causal, q_offset, block_q, block_k, n_heads,
                   with_bias):
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        dg_scr[:] = jnp.zeros_like(dg_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kv_len = kv_len_ref[pl.program_id(0) // n_heads]
    row_ok = (j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)) < kv_len
    k = jnp.where(row_ok, k, 0.0)
    v = jnp.where(row_ok, v, 0.0)
    pb = pos_bias_ref[0].astype(jnp.float32) if with_bias else None
    g = gate_ref[0, 0, :].astype(jnp.float32) if with_bias else None

    i_abs0 = pl.program_id(1) * block_q + q_offset
    p, valid = _recompute_p(q, k, lse_ref[0, 0], kv_len, j, i_abs0, scale,
                            causal, with_bias, pb, g, block_q, block_k)

    do = do_ref[0]                                            # [bq, D]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])                  # [bq, bk]
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if with_bias:
        # pb columns past the physical S boundary are block padding (NaN in
        # interpret mode); ds is 0 there but 0*NaN still poisons the row sum
        dg_scr[:, :1] += jnp.sum(ds * jnp.where(valid, pb, 0.0), axis=-1,
                                 keepdims=True)

    @pl.when(j == n_j - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)
        dg_ref[0, 0] = dg_scr[:, 0].astype(dg_ref.dtype)


def _bwd_dkv_kernel(kv_len_ref, q_ref, k_ref, v_ref, pos_bias_ref, gate_ref,
                    lse_ref, delta_ref, do_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *,
                    scale, causal, q_offset, block_q, block_k, n_heads,
                    q_len, with_bias):
    # grid (B*Hq, S_blocks, T_blocks): T innermost, k/v block resident
    i = pl.program_id(2)
    n_i = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kv_len = kv_len_ref[pl.program_id(0) // n_heads]
    row_ok = (j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)) < kv_len
    k = jnp.where(row_ok, k, 0.0)
    v = jnp.where(row_ok, v, 0.0)
    pb = pos_bias_ref[0].astype(jnp.float32) if with_bias else None
    g = gate_ref[0, 0, :].astype(jnp.float32) if with_bias else None

    i_abs0 = i * block_q + q_offset
    p, _ = _recompute_p(q, k, lse_ref[0, 0], kv_len, j, i_abs0, scale,
                        causal, with_bias, pb, g, block_q, block_k)

    # ragged T tail: rows beyond q_len hold undefined block padding (their
    # lse/delta can be inf/NaN) and would otherwise pollute the dk/dv sums.
    # Zero the padded q/do rows themselves too: 0-weighted NaN inside a dot
    # still contaminates the contraction.
    q_ok = (i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)) < q_len
    p = jnp.where(q_ok, p, 0.0)
    q = jnp.where(q_ok, q, 0.0)

    do = jnp.where(q_ok, do_ref[0], 0.0)
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [bk, D]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = jnp.where(q_ok, p * (dp - delta_ref[0, 0][:, None]), 0.0)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale           # [bk, D]

    @pl.when(i == n_i - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dpb_kernel(kv_len_ref, q_ref, k_ref, v_ref, pos_bias_ref, gate_ref,
                    lse_ref, delta_ref, do_ref,
                    dpb_ref, dpb_scr, *,
                    scale, causal, q_offset, block_q, block_k, n_heads,
                    n_batch, with_bias):
    # grid (Hq, T_blocks, S_blocks, B): batch innermost, dpb block resident
    b = pl.program_id(3)
    j = pl.program_id(2)

    @pl.when(b == 0)
    def _():
        dpb_scr[:] = jnp.zeros_like(dpb_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kv_len = kv_len_ref[b]
    row_ok = (j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)) < kv_len
    k = jnp.where(row_ok, k, 0.0)
    v = jnp.where(row_ok, v, 0.0)
    pb = pos_bias_ref[0].astype(jnp.float32)
    g = gate_ref[0, 0, :].astype(jnp.float32)

    i_abs0 = pl.program_id(1) * block_q + q_offset
    p, _ = _recompute_p(q, k, lse_ref[0, 0], kv_len, j, i_abs0, scale,
                        causal, True, pb, g, block_q, block_k)
    do = do_ref[0]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])
    dpb_scr[:] += g[:, None] * ds

    @pl.when(b == n_batch - 1)
    def _():
        dpb_ref[0] = dpb_scr[:].astype(dpb_ref.dtype)


def _flash_backward(q, k, v, kv_lens, pos_bias, gate, out, lse, g_out,
                    scale, causal, q_offset, block_q, block_k, interpret):
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    block_q = min(block_q, T)
    block_k = min(block_k, S)
    with_bias = pos_bias is not None

    q_f = q.transpose(0, 2, 1, 3).reshape(B * Hq, T, D)
    k_f = k.transpose(0, 2, 1, 3).reshape(B * Hkv, S, D)
    v_f = v.transpose(0, 2, 1, 3).reshape(B * Hkv, S, D)
    do_f = g_out.transpose(0, 2, 1, 3).reshape(B * Hq, T, D)
    delta = jnp.sum(g_out.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                                  # [B, T, Hq]
    # [B*Hq, 1, T]: same 3D row layout as lse (legal TPU block tiling)
    delta_f = delta.transpose(0, 2, 1).reshape(B * Hq, 1, T)

    if kv_lens is None:
        kv_lens_arr = jnp.full((B,), S, jnp.int32)
    else:
        kv_lens_arr = kv_lens.astype(jnp.int32)
    if with_bias:
        gate_f = gate.reshape(B * Hq, 1, T)
        pb_in = pos_bias
    else:
        pb_in = jnp.zeros((1, 8, 128), q.dtype)
        gate_f = jnp.zeros((1, 1, 128), q.dtype)

    kw = dict(scale=scale, causal=causal, q_offset=q_offset,
              block_q=block_q, block_k=block_k, n_heads=Hq,
              with_bias=with_bias)

    def q_spec(order):
        # order='tq' -> grid (bh, i, j); 'sq' -> grid (bh, j, i)
        if order == "tq":
            return pl.BlockSpec((1, block_q, D),
                                lambda bh, i, j, kv: (bh, i, 0))
        return pl.BlockSpec((1, block_q, D),
                            lambda bh, j, i, kv: (bh, i, 0))

    def kv_spec(order):
        def to_kv(bh):
            return bh // Hq * Hkv + (bh % Hq) // group
        if order == "tq":
            return pl.BlockSpec((1, block_k, D),
                                lambda bh, i, j, kv: (to_kv(bh), j, 0))
        return pl.BlockSpec((1, block_k, D),
                            lambda bh, j, i, kv: (to_kv(bh), j, 0))

    def row_spec(order, width):
        # lse/delta are [B*Hq, 1, T]
        if order == "tq":
            return pl.BlockSpec((1, 1, width),
                                lambda bh, i, j, kv: (bh, 0, i))
        return pl.BlockSpec((1, 1, width), lambda bh, j, i, kv: (bh, 0, i))

    def do_spec(order):
        if order == "tq":
            return pl.BlockSpec((1, block_q, D),
                                lambda bh, i, j, kv: (bh, i, 0))
        return pl.BlockSpec((1, block_q, D),
                            lambda bh, j, i, kv: (bh, i, 0))

    def bias_specs(order):
        if not with_bias:
            if order == "tq":
                return [pl.BlockSpec((1, 8, 128),
                                     lambda bh, i, j, kv: (0, 0, 0)),
                        pl.BlockSpec((1, 1, 128),
                                     lambda bh, i, j, kv: (0, 0, 0))]
            return [pl.BlockSpec((1, 8, 128),
                                 lambda bh, j, i, kv: (0, 0, 0)),
                    pl.BlockSpec((1, 1, 128),
                                 lambda bh, j, i, kv: (0, 0, 0))]
        if order == "tq":
            return [pl.BlockSpec((1, block_q, block_k),
                                 lambda bh, i, j, kv: (bh % Hq, i, j)),
                    pl.BlockSpec((1, 1, block_q),
                                 lambda bh, i, j, kv: (bh, 0, i))]
        return [pl.BlockSpec((1, block_q, block_k),
                             lambda bh, j, i, kv: (bh % Hq, i, j)),
                pl.BlockSpec((1, 1, block_q),
                             lambda bh, j, i, kv: (bh, 0, i))]

    # ---- kernel A: dq (+dg) --------------------------------------------
    grid_a = (B * Hq, pl.cdiv(T, block_q), pl.cdiv(S, block_k))
    spec_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid_a,
        in_specs=[q_spec("tq"), kv_spec("tq"), kv_spec("tq")]
        + bias_specs("tq")
        + [row_spec("tq", block_q), row_spec("tq", block_q), do_spec("tq")],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, i, j, kv: (bh, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j, kv: (bh, 0, i)),
        ],
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32),
                        pltpu.VMEM((block_q, 128), jnp.float32)],
    )
    dq_f, dg_f = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid_spec=spec_a,
        out_shape=[jax.ShapeDtypeStruct((B * Hq, T, D), jnp.float32),
                   jax.ShapeDtypeStruct((B * Hq, 1, T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kv_lens_arr, q_f, k_f, v_f, pb_in, gate_f, lse, delta_f, do_f)

    # ---- kernel B: per-q-head dk/dv, group-summed after ------------------
    grid_b = (B * Hq, pl.cdiv(S, block_k), pl.cdiv(T, block_q))
    spec_b = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid_b,
        in_specs=[q_spec("sq"), kv_spec("sq"), kv_spec("sq")]
        + bias_specs("sq")
        + [row_spec("sq", block_q), row_spec("sq", block_q), do_spec("sq")],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda bh, j, i, kv: (bh, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, j, i, kv: (bh, j, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                        pltpu.VMEM((block_k, D), jnp.float32)],
    )
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, q_len=T, **kw),
        grid_spec=spec_b,
        out_shape=[jax.ShapeDtypeStruct((B * Hq, S, D), jnp.float32),
                   jax.ShapeDtypeStruct((B * Hq, S, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kv_lens_arr, q_f, k_f, v_f, pb_in, gate_f, lse, delta_f, do_f)
    dk = dk_h.reshape(B, Hkv, group, S, D).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dv_h.reshape(B, Hkv, group, S, D).sum(axis=2).transpose(0, 2, 1, 3)

    dq = dq_f.reshape(B, Hq, T, D).transpose(0, 2, 1, 3).astype(q.dtype)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)

    if not with_bias:
        return dq, dk, dv, None, None

    dg = dg_f.reshape(B, Hq, T).astype(gate.dtype)

    # ---- kernel C: dpb accumulated over batch ----------------------------
    grid_c = (Hq, pl.cdiv(T, block_q), pl.cdiv(S, block_k), B)
    spec_c = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid_c,
        in_specs=[
            pl.BlockSpec((1, block_q, D),
                         lambda h, i, j, b, kv: (b * Hq + h, i, 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, i, j, b, kv: (b * Hkv + h // group, j, 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, i, j, b, kv: (b * Hkv + h // group, j, 0)),
            pl.BlockSpec((1, block_q, block_k),
                         lambda h, i, j, b, kv: (h, i, j)),
            pl.BlockSpec((1, 1, block_q),
                         lambda h, i, j, b, kv: (b * Hq + h, 0, i)),
            pl.BlockSpec((1, 1, block_q),
                         lambda h, i, j, b, kv: (b * Hq + h, 0, i)),
            pl.BlockSpec((1, 1, block_q),
                         lambda h, i, j, b, kv: (b * Hq + h, 0, i)),
            pl.BlockSpec((1, block_q, D),
                         lambda h, i, j, b, kv: (b * Hq + h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, block_k),
                               lambda h, i, j, b, kv: (h, i, j)),
        scratch_shapes=[pltpu.VMEM((block_q, block_k), jnp.float32)],
    )
    dpb = pl.pallas_call(
        functools.partial(_bwd_dpb_kernel, n_batch=B, **{
            k_: v_ for k_, v_ in kw.items() if k_ != "with_bias"},
            with_bias=True),
        grid_spec=spec_c,
        out_shape=jax.ShapeDtypeStruct((Hq, T, S), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kv_lens_arr, q_f, k_f, v_f, pb_in, gate_f, lse, delta_f, do_f)
    return dq, dk, dv, dpb.astype(pos_bias.dtype), dg


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
           block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, kv_lens, pos_bias, gate, scale, causal,
                            q_offset, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
               block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, kv_lens, pos_bias, gate, scale,
                              causal, q_offset, block_q, block_k, interpret)
    return out, (q, k, v, kv_lens, pos_bias, gate, out, lse)


def _flash_bwd(scale, causal, q_offset, block_q, block_k, interpret, res,
               g_out):
    q, k, v, kv_lens, pos_bias, gate, out, lse = res
    if os.environ.get("MTASR_FLASH_XLA_BWD"):
        def f(q, k, v, pos_bias, gate):
            return _reference(q, k, v, kv_lens, pos_bias, gate, scale,
                              causal, q_offset)
        _, vjp = jax.vjp(f, q, k, v, pos_bias, gate)
        dq, dk, dv, dpb, dg = vjp(g_out)
        return dq, dk, dv, None, dpb, dg
    dq, dk, dv, dpb, dg = _flash_backward(
        q, k, v, kv_lens, pos_bias, gate, out, lse, g_out, scale, causal,
        q_offset, block_q, block_k, interpret)
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
