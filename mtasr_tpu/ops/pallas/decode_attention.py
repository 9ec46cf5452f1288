"""Fused single-token (decode-step) attention over the merged-lane KV cache.

Replaces the XLA einsum attention for the L=1 KV-cached decode step
(the reference's FA2/SDPA decode path — /root/reference runs HF
`LlamaSdpaAttention` with a DynamicCache; here the cache is a preallocated
[B, S_max, Hkv*D] HBM buffer, models/llama.py::KVCache).

Why a Pallas kernel: profiling the decode step (DESIGN.md round 3) showed
XLA moving ~13.4 GB/step against a ~3.4 GB theoretical stream. Two causes:

* the [B, S, Hkv, D=64] cache layout is lane-padded 64->128 in HBM,
  doubling every cache byte (fixed by the merged-lane [B, S, Hkv*D] cache);
* the attention einsum wants a [B, Hkv, S, D] layout, so XLA materializes
  transposed copies of both caches every step, and the transpose+carry
  interaction defeats in-place dynamic_update_slice.

This kernel reads the cache in its native merged-lane layout — block
(Bb, S, Hkv*D) streamed HBM->VMEM with Mosaic's automatic double
buffering — and reshapes to heads **in VMEM**, so HBM sees exactly one
contiguous pass over K and V and no transposed copies. GQA is handled by
batching the dot_generals over (batch row, kv head): q [Bb, Hkv, G, D]
against k [Bb, S, Hkv, D] contracting D, so no 4x head-expansion of the
cache is ever materialized.

The surrounding dynamic_update_slice (writing the step's new K/V slot)
stays in XLA: with the kernel as the only other consumer, XLA keeps the
update in place (measured: the DUS+attention+carry step dropped from
11.9 ms to ~3 ms/step at B=128, S=214, 16 layers).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, Bb, S, Hkv, G, D):
    """One program handles Bb batch rows: softmax(q k^T + mask) v.

    Blocks: mask (Bb, S) int8 VMEM, q (Bb, Hq*D) VMEM,
    k/v (Bb, S, Hkv*D) VMEM, o (Bb, Hq*D) VMEM.

    GQA is a static Python loop over the Hkv kv-heads (Mosaic's tpu.matmul
    supports at most one batch dim, so a (b, hkv)-batched dot_general fails
    verification); each iteration slices that head's D lanes out of the
    merged lane dim — a static VMEM lane slice, no HBM-side relayout.
    The mask arrives as a pre-shaped [Bb, 1, S] f32 additive bias
    (0 / -1e9): Mosaic can broadcast a unit dim but rejects the 2D->3D
    shape cast a [Bb, S] bool mask would need.
    """
    bias = mask_ref[:]                                # [Bb, 1, S] f32
    scale = D ** -0.5
    for h in range(Hkv):
        k_h = k_ref[:, :, h * D:(h + 1) * D]          # [Bb, S, D] lane slice
        v_h = v_ref[:, :, h * D:(h + 1) * D]
        q_h = q_ref[:, h * G:(h + 1) * G, :]          # [Bb, G, D] sublane slice
        # scores[b, g, s]: contract D, batch b
        scores = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_h.dtype)
        # out[b, g, d]: contract S, batch b
        out = jax.lax.dot_general(
            p, v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, h * G:(h + 1) * G, :] = out.astype(o_ref.dtype)


def _pick_bb(B: int, S: int, HD: int, itemsize: int = 2) -> int:
    """Largest Bb dividing B whose double-buffered K+V blocks fit VMEM."""
    for bb in (16, 8, 4, 2, 1):
        if B % bb:
            continue
        # 2 inputs (k, v) x 2 pipeline buffers
        if 4 * bb * S * HD * itemsize <= _VMEM_BUDGET:
            return bb
    return 1


def supported(q_heads: int, kv_heads: int, head_dim: int) -> bool:
    """Shapes the kernel handles; callers fall back to XLA otherwise."""
    return (q_heads % kv_heads == 0
            and (kv_heads * head_dim) % _LANE == 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     mask: jax.Array, *, interpret: bool = False
                     ) -> jax.Array:
    """Single-step attention over the full cache.

    Args:
      q: [B, Hq, D] current token's queries (RoPE already applied).
      k_cache, v_cache: [B, S, Hkv*D] merged-lane cache buffers (the new
        token's K/V already written at its slot via dynamic_update_slice).
      mask: [B, S] bool — True where the key slot is attendable (valid
        and causally visible).

    Returns: [B, Hq, D] attention output (same dtype as q).
    """
    B, Hq, D = q.shape
    S, HD = k_cache.shape[1], k_cache.shape[2]
    Hkv = HD // D
    G = Hq // Hkv
    Bb = _pick_bb(B, S, HD)
    kern = functools.partial(_kernel, Bb=Bb, S=S, Hkv=Hkv, G=G, D=D)
    bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)[:, None, :]
    out = pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, Hq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Hq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=interpret,
    )(bias, q, k_cache, v_cache)
    return out


def _kernel_chunk(mask_ref, q_ref, k_ref, v_ref, o_ref,
                  *, Bb, L, S, Hkv, G, D):
    """bf16 L-token chunk variant (the speculative-verify step). Without
    this, the L>1 verify forward fell back to the XLA einsum whose
    transposed cache copies the L=1 kernel was built to kill — measured
    49 ms/verify-step vs 8 ms/decode-step at B=256 (DESIGN.md round 3e),
    which made speculative decoding a net LOSS even at 100% draft
    acceptance.

    Same per-kv-head loop as the L=1 kernel, with each head's dot carrying
    M = G*L rows (all chunk positions of the head's query group). The
    caller lays q out HEAD-MAJOR — [Bb, Hkv*G*L, D] with head h's rows
    contiguous at [h*G*L, (h+1)*G*L) — so each head is a static sublane
    slice. (A block-diagonal all-heads formulation — the int8 L=1 trick —
    was measured first: its M = L*Hq rows x full-HD contraction costs
    Hkv x the MACs, ~2.2 TFLOP per verify step at the bench shape, and the
    MXU is NOT idle at that size: 26.7 ms/step vs 8 ms plain. The per-head
    form is ~68 GFLOP/step.)

    The per-(position, key) bias arrives pre-shaped [Bb, L, S] f32 and is
    expanded once to the G*L row layout by an iota-selection dot
    (row r -> position r % L; Mosaic rejects the reshape/broadcast).
    """
    GL = G * L
    scale = D ** -0.5
    # bias rows for one head block: row r = g*L + l -> position l = r % L
    RL = (jax.lax.broadcasted_iota(jnp.int32, (Bb, GL, L), 1) % L
          == jax.lax.broadcasted_iota(jnp.int32, (Bb, GL, L), 2)
          ).astype(jnp.float32)
    bias_e = jax.lax.dot_general(RL, mask_ref[:],
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    for h in range(Hkv):
        k_h = k_ref[:, :, h * D:(h + 1) * D]          # [Bb, S, D] lane slice
        v_h = v_ref[:, :, h * D:(h + 1) * D]
        q_h = q_ref[:, h * GL:(h + 1) * GL, :]        # [Bb, GL, D] sublanes
        scores = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + bias_e
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_h.dtype)
        out = jax.lax.dot_general(
            p, v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, h * GL:(h + 1) * GL, :] = out.astype(o_ref.dtype)


def _chunk_head_major(q: jax.Array) -> jax.Array:
    """[B, L, Hq, D] -> [B, Hkv*G*L, D] with each kv-head's G*L rows
    contiguous (head-major), matching _kernel_chunk's slicing."""
    B, L, Hq, D = q.shape
    return jnp.transpose(q, (0, 2, 1, 3)).reshape(B, Hq * L, D)


def _chunk_from_head_major(o: jax.Array, L: int, Hq: int) -> jax.Array:
    """Inverse of _chunk_head_major for the kernel output."""
    B, _, D = o.shape
    return jnp.transpose(o.reshape(B, Hq, L, D), (0, 2, 1, 3))


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_chunk(q: jax.Array, k_cache: jax.Array,
                           v_cache: jax.Array, mask: jax.Array,
                           *, interpret: bool = False) -> jax.Array:
    """L-token chunk attention over the full cache (speculative verify).

    Args:
      q: [B, L, Hq, D] chunk queries (RoPE applied).
      k_cache, v_cache: [B, S, Hkv*D] merged-lane cache buffers (the
        chunk's K/V already written at its slots).
      mask: [B, L, S] bool — True where chunk position l may attend slot s
        (valid AND causally visible, including within-chunk causality).

    Returns: [B, L, Hq, D] in q's dtype.
    """
    B, L, Hq, D = q.shape
    S, HD = k_cache.shape[1], k_cache.shape[2]
    Hkv = HD // D
    G = Hq // Hkv
    Bb = _pick_bb(B, S, HD)
    kern = functools.partial(_kernel_chunk, Bb=Bb, L=L, S=S, Hkv=Hkv, G=G,
                             D=D)
    bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, L, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, L * Hq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, L * Hq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L * Hq, D), q.dtype),
        interpret=interpret,
    )(bias, _chunk_head_major(q), k_cache, v_cache)
    return _chunk_from_head_major(out, L, Hq)


def _kernel_int8(mask_ref, kvs_ref, q_ref, k_ref, v_ref, o_ref,
                 *, Bb, S, Hkv, G, D):
    """int8-KV variant. k/v blocks are int8 [Bb, S, Hkv*D]; per-slot
    symmetric scales for both k and v arrive in ONE array in the cache's
    native transposed [Bb, 2*Hkv, S] bf16 layout (kv-major interleaved
    rows k_0, v_0, k_1, v_1, …), so
    each head's scale row is a sublane slice (a [Bb, S] -> [Bb, 1, S]
    reshape would be an unsupported Mosaic shape cast) and no transpose
    copy sits between cache and kernel. Dequant
    never materializes — and neither does a bf16 copy of the cache: both
    matmuls run NATIVELY int8 x int8 -> int32 on the MXU. The first
    version of this kernel astype'd the full k/v blocks to bf16 in VMEM,
    a VPU pass over every cache byte (~150 us/layer at the bench shape)
    that made the int8 cache measurably SLOWER than the bf16 cache
    (decode-step matrix, DESIGN.md round 3b). Instead the tiny per-step
    operands are quantized to meet the cache's dtype: q per (row, head)
    and the v-scale-folded softmax probs per (row, query) — both
    [Bb, G, *] arrays, ~1000x smaller than the cache blocks. The K scale
    folds into the scores and the V scale into the probs before their
    quantization, so HBM and VMEM both see only the int8 stream."""
    HD = Hkv * D
    Hq = Hkv * G
    bias = mask_ref[:]                                # [Bb, 1, S] f32
    scale = D ** -0.5
    # Block-diagonal formulation: ONE dot chain over all heads per program
    # instead of a per-head Python loop of [G, D] @ [D, S] matmuls. The
    # per-head loop issues Hkv x Bb tiny (M=G=4) matmuls per program whose
    # dispatch latency dominates (measured 3.55 -> 2.99 ms/step for the
    # 16-layer decode attention at B=256, S=214). Here q is expanded to a
    # block-diagonal [Bb, Hq, HD] (zero outside each query head's kv-head
    # lane block), so contracting the FULL merged lane dim against the
    # cache block computes every head's scores in one batched dot — the
    # 8x redundant MACs hit zeros and the MXU was idle anyway. All
    # expansions/extractions are themselves dots (Mosaic rejects the
    # 2D->3D shape casts a reshape would need), and every int8 dot
    # accumulates exactly in int32, so this is bitwise-identical to the
    # per-head form.
    q_ = q_ref[:].astype(jnp.float32)                 # [Bb, Hq, D]
    # dynamic per-(row, query-head) symmetric quantization of q
    sq = jnp.max(jnp.abs(q_), axis=-1, keepdims=True) / 127.0
    sq = jnp.maximum(sq, 1e-12)
    q8 = jnp.clip(jnp.round(q_ / sq), -127, 127).astype(jnp.int8)
    # lane-expand [Bb, Hq, D] -> [Bb, Hq, HD] (E: D -> lane l = l % D)
    E = (jax.lax.broadcasted_iota(jnp.int32, (D, HD), 1) % D
         == jax.lax.broadcasted_iota(jnp.int32, (D, HD), 0)).astype(jnp.int8)
    q_t = jax.lax.dot_general(q8, E, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    bd = (jax.lax.broadcasted_iota(jnp.int32, (Bb, Hq, HD), 2) // D
          == jax.lax.broadcasted_iota(jnp.int32, (Bb, Hq, HD), 1) // G)
    q_bd = jnp.where(bd, q_t, 0).astype(jnp.int8)
    acc = jax.lax.dot_general(q_bd, k_ref[:], (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)  # [Bb,Hq,S]
    # expand the per-kv-head scale rows to per-query-head rows. Scale rows
    # are kv-major interleaved (k_0, v_0, k_1, v_1, … — the layout TP
    # head-sharding partitions, see models/llama.py + ops/pallas/spmd.py),
    # so the 0/1 selection matmuls pick row 2·kh (k) / 2·kh+1 (v) straight
    # from the full [Bb, 2*Hkv, S] block — a dot, not a sublane
    # deinterleave (strided sublane slices are unsupported in Mosaic)
    row = jax.lax.broadcasted_iota(jnp.int32, (Bb, Hq, 2 * Hkv), 2)
    kh2 = 2 * (jax.lax.broadcasted_iota(jnp.int32, (Bb, Hq, 2 * Hkv), 1)
               // G)
    kvs = kvs_ref[:].astype(jnp.float32)              # [Bb, 2*Hkv, S]
    ks_e = jax.lax.dot_general((row == kh2).astype(jnp.float32), kvs,
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    vs_e = jax.lax.dot_general((row == kh2 + 1).astype(jnp.float32), kvs,
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    scores = acc.astype(jnp.float32) * (sq * scale) * ks_e + bias
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)) * vs_e
    sp = jnp.max(p, axis=-1, keepdims=True) / 127.0   # p >= 0
    sp = jnp.maximum(sp, 1e-12)
    p8 = jnp.clip(jnp.round(p / sp), -127, 127).astype(jnp.int8)
    full = jax.lax.dot_general(p8, v_ref[:], (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)  # [Bb,Hq,HD]
    full = full.astype(jnp.float32) * bd.astype(jnp.float32)
    # extract each head's D-lane block: sum the (single nonzero) block
    Sel = (jax.lax.broadcasted_iota(jnp.int32, (HD, D), 0) % D
           == jax.lax.broadcasted_iota(jnp.int32, (HD, D), 1)
           ).astype(jnp.float32)
    out = jax.lax.dot_general(full, Sel, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out * sp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_int8(q: jax.Array, k_cache: jax.Array,
                          v_cache: jax.Array, kv_scale: jax.Array,
                          mask: jax.Array,
                          *, interpret: bool = False) -> jax.Array:
    """Single-step attention over an int8 cache with per-(b, s, h) scales.

    Args:
      q: [B, Hq, D] queries (bf16/f32).
      k_cache, v_cache: [B, S, Hkv*D] int8 merged-lane buffers.
      kv_scale: [B, 2*Hkv, S] bf16 symmetric scales, k rows then v rows
        (the cache's native transposed layout — models/llama.py::KVCache).
      mask: [B, S] bool.

    Returns: [B, Hq, D] in q's dtype.
    """
    B, Hq, D = q.shape
    S, HD = k_cache.shape[1], k_cache.shape[2]
    Hkv = HD // D
    G = Hq // Hkv
    Bb = _pick_bb(B, S, HD, itemsize=1)
    kern = functools.partial(_kernel_int8, Bb=Bb, S=S, Hkv=Hkv, G=G, D=D)
    bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)[:, None, :]
    out = pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 2 * Hkv, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, Hq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Hq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=interpret,
    )(bias, kv_scale, q, k_cache, v_cache)
    return out


def _kernel_int8_chunk(mask_ref, kvs_ref, q_ref, k_ref, v_ref, o_ref,
                       *, Bb, L, S, Hkv, G, D):
    """int8 L-token chunk variant: the per-kv-head loop of _kernel_chunk
    with the int8 kernel's scale folding (k scale into scores, v scale
    into probs, native int8 MXU dots — see _kernel_int8's docstring). Each
    head's M = G*L rows; q arrives HEAD-MAJOR like _kernel_chunk. The
    block-diagonal all-heads form is NOT used here: at M = L*Hq its
    Hkv x redundant MACs are no longer free (DESIGN.md round 3e)."""
    GL = G * L
    scale = D ** -0.5
    RL = (jax.lax.broadcasted_iota(jnp.int32, (Bb, GL, L), 1) % L
          == jax.lax.broadcasted_iota(jnp.int32, (Bb, GL, L), 2)
          ).astype(jnp.float32)
    bias_e = jax.lax.dot_general(RL, mask_ref[:],
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    kvs = kvs_ref[:].astype(jnp.float32)              # [Bb, 2*Hkv, S]
    for h in range(Hkv):
        k_h = k_ref[:, :, h * D:(h + 1) * D]          # [Bb, S, D] int8
        v_h = v_ref[:, :, h * D:(h + 1) * D]
        q_h = q_ref[:, h * GL:(h + 1) * GL, :].astype(jnp.float32)
        ks_h = kvs[:, 2 * h:2 * h + 1, :]             # [Bb, 1, S]
        vs_h = kvs[:, 2 * h + 1:2 * h + 2, :]
        sq = jnp.max(jnp.abs(q_h), axis=-1, keepdims=True) / 127.0
        sq = jnp.maximum(sq, 1e-12)
        q8 = jnp.clip(jnp.round(q_h / sq), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q8, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)         # [Bb, GL, S]
        scores = acc.astype(jnp.float32) * (sq * scale) * ks_h + bias_e
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)) * vs_h
        sp = jnp.max(p, axis=-1, keepdims=True) / 127.0   # p >= 0
        sp = jnp.maximum(sp, 1e-12)
        p8 = jnp.clip(jnp.round(p / sp), -127, 127).astype(jnp.int8)
        out = jax.lax.dot_general(
            p8, v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)         # [Bb, GL, D]
        o_ref[:, h * GL:(h + 1) * GL, :] = (
            out.astype(jnp.float32) * sp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_int8_chunk(q: jax.Array, k_cache: jax.Array,
                                v_cache: jax.Array, kv_scale: jax.Array,
                                mask: jax.Array,
                                *, interpret: bool = False) -> jax.Array:
    """L-token chunk attention over an int8 cache (speculative verify).

    Args:
      q: [B, L, Hq, D] chunk queries.
      k_cache, v_cache: [B, S, Hkv*D] int8 merged-lane buffers.
      kv_scale: [B, 2*Hkv, S] bf16 scales (kv-major interleaved rows).
      mask: [B, L, S] bool.

    Returns: [B, L, Hq, D] in q's dtype.
    """
    B, L, Hq, D = q.shape
    S, HD = k_cache.shape[1], k_cache.shape[2]
    Hkv = HD // D
    G = Hq // Hkv
    Bb = _pick_bb(B, S, HD, itemsize=1)
    kern = functools.partial(_kernel_int8_chunk, Bb=Bb, L=L, S=S, Hkv=Hkv,
                             G=G, D=D)
    bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, L, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 2 * Hkv, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, L * Hq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, L * Hq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L * Hq, D), q.dtype),
        interpret=interpret,
    )(bias, kv_scale, _chunk_head_major(q), k_cache, v_cache)
    return _chunk_from_head_major(out, L, Hq)
