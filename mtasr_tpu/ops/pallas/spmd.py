"""SPMD partitioning rules for every Pallas kernel in the framework:
the four decode-attention variants, flash attention (forward + 3-kernel
backward), and the conv0 frontend kernel.

Pallas lowers to Mosaic custom calls, which the XLA/Shardy partitioner
cannot partition on its own: under a dp x tp mesh it would gather every
operand — including the full KV cache — onto every device, defeating
tensor parallelism exactly at the 8B serving scale where it is
load-bearing for memory (the reference's analog is NCCL DDP inference,
/root/reference/inference_asr_gpus.py:50-66, which never shards the
model; TP is this framework's extension, SURVEY §2.3).

These wrappers register `jax.experimental.custom_partitioning` rules so a
kernel call on sharded operands becomes per-device kernel calls on
shard-local shapes — the single-chip regime the kernels are validated in
(tests/test_decode_attention.py) — with

* batch shardable on any mesh axes (dp), and
* heads shardable at kv-head granularity (tp): the GQA q<->cache linkage
  is expressed with Shardy compound factors — q's head dim is (kv g) and
  the cache's merged lane dim is (kv dk), so sharding the shared `kv`
  factor splits q rows and cache lanes consistently. The int8 scale rows
  are (kv two) — kv-major interleaved k_0, v_0, k_1, v_1, … precisely so
  this factorization exists (models/llama.py::KVCache).

If the per-shard geometry falls outside `decode_attention.supported`
(e.g. tp > Hkv leaves < 128 merged lanes per shard), the per-shard
lowering falls back to a plain-XLA reference computation — still fully
sharded, just without the no-copy kernel. Nothing is ever gathered.

Dispatch: models/llama.py routes here for
`LlamaConfig.decode_attn_impl == "pallas_spmd"`, which the mesh-building
CLIs select whenever a mesh is active; the single-device default
("pallas") keeps calling the kernels directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning

from mtasr_tpu.ops.pallas import decode_attention as _da


def _dims(t) -> tuple:
    """Shape of an MLIR ranked tensor type (the sharding_rule callable
    receives ir.Type objects, not avals)."""
    from jax._src.lib.mlir import ir
    return tuple(ir.RankedTensorType(t).shape)


def _ref_bf16(q, k_cache, v_cache, mask):
    """Plain-XLA fallback, shard-local. q [B, (L,) Hq, D]; caches
    [B, S, Hkv*D]; mask [B, (L,) S]. Mirrors the XLA path in
    models/llama.py::_attention (dequantized closures)."""
    chunk = q.ndim == 4
    if not chunk:
        q, mask = q[:, None], mask[:, None]
    B, L, Hq, D = q.shape
    S, HD = k_cache.shape[1], k_cache.shape[2]
    Hkv = HD // D
    kh = k_cache.reshape(B, S, Hkv, D).astype(q.dtype)
    vh = v_cache.reshape(B, S, Hkv, D).astype(q.dtype)
    out = jax.nn.dot_product_attention(
        q, kh, vh, mask=mask[:, None, :, :], scale=D ** -0.5)
    return out if chunk else out[:, 0]


def _ref_int8(q, k_cache, v_cache, kv_scale, mask):
    """int8 fallback: dequantize the shard-local cache with the
    interleaved scale rows, then _ref_bf16."""
    B = q.shape[0]
    S, HD = k_cache.shape[1], k_cache.shape[2]
    D = q.shape[-1]
    Hkv = HD // D
    ks = jnp.swapaxes(kv_scale[:, 0::2, :], 1, 2).astype(jnp.float32)
    vs = jnp.swapaxes(kv_scale[:, 1::2, :], 1, 2).astype(jnp.float32)
    kf = (k_cache.reshape(B, S, Hkv, D).astype(jnp.float32)
          * ks[..., None]).reshape(B, S, HD).astype(q.dtype)
    vf = (v_cache.reshape(B, S, Hkv, D).astype(jnp.float32)
          * vs[..., None]).reshape(B, S, HD).astype(q.dtype)
    return _ref_bf16(q, kf, vf, mask)


def _rules(int8: bool, chunk: bool):
    """(einsum-like rule, need_replication factors) for the operand order
    (q, k, v, [kv_scale,] mask). Factors, in order of first appearance
    (Shardy requires need_replication_factors sorted by factor index):
    b batch | l chunk position | kv kv-head (THE shardable head factor) |
    g queries per kv head | d q/o head_dim | s cache slots | dk lane
    head_dim | two k/v scale row pair."""
    q_m = "b l (kv g) d" if chunk else "b (kv g) d"
    c_m = "b s (kv dk)"
    m_m = "b l s" if chunk else "b s"
    ops = [q_m, c_m, c_m] + (["b (kv two) s"] if int8 else []) + [m_m]
    rule = ", ".join(ops) + " -> " + q_m
    need = (("l",) if chunk else ()) + ("g", "d", "s", "dk") \
        + (("two",) if int8 else ())
    return rule, need


@functools.lru_cache(maxsize=None)
def _make(int8: bool, chunk: bool, interpret: bool):
    if int8:
        impl = (_da.decode_attention_int8_chunk if chunk
                else _da.decode_attention_int8)
        ref = _ref_int8
    else:
        impl = (_da.decode_attention_chunk if chunk
                else _da.decode_attention)
        ref = _ref_bf16

    def fn(*ops):
        return impl(*ops, interpret=interpret)

    cp = custom_partitioning(fn)

    def sharding_rule(mesh, value_types, result_types):
        del mesh, result_types
        q_shape = _dims(value_types[0])
        hd = _dims(value_types[1])[-1]
        d = q_shape[-1]
        hq = q_shape[-2]
        kv = hd // d
        rule, need = _rules(int8, chunk)
        return rule, dict(need_replication_factors=need,
                          kv=kv, g=hq // kv, dk=d,
                          **(dict(two=2) if int8 else {}))

    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec

        arg_shardings = tuple(a.sharding for a in arg_shapes)
        out_sharding = result_shape.sharding

        def _local(a):
            try:
                return a.sharding.shard_shape(a.shape)
            except Exception:
                return a.shape

        q_l, k_l = _local(arg_shapes[0]), _local(arg_shapes[1])
        d = q_l[-1]
        hq_l = q_l[-2]
        hkv_l = k_l[-1] // d
        # the per-shard q/cache head split must preserve the global GQA
        # ratio — guaranteed when the Shardy rule drove propagation, but
        # re-checked so a hand-placed / GSPMD-mode sharding can never
        # reach the kernel (or the reference math) with mismatched heads
        g_global = arg_shapes[0].shape[-2] // (arg_shapes[1].shape[-1] // d)
        consistent = (k_l[-1] % d == 0 and hkv_l >= 1
                      and hq_l == g_global * hkv_l)
        if not consistent:
            # defensive reshard: keep only the batch-dim sharding (the
            # partitioner inserts the reshapes); result mirrors q's dims
            def batch_only(a):
                spec = a.sharding.spec
                b = spec[0] if len(spec) else None
                return NamedSharding(
                    mesh, PartitionSpec(b, *([None] * (len(a.shape) - 1))))

            arg_shardings = tuple(batch_only(a) for a in arg_shapes)
            out_sharding = batch_only(arg_shapes[0])
            kernel_ok = _da.supported(
                arg_shapes[0].shape[-2], arg_shapes[1].shape[-1] // d, d)
        else:
            kernel_ok = _da.supported(hq_l, hkv_l, d)

        def lower_fn(*ops):
            return (fn if kernel_ok else ref)(*ops)

        return mesh, lower_fn, out_sharding, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        # GSPMD-mode (jax_use_shardy_partitioner=False) compatibility:
        # the output mirrors q's sharding
        del mesh, result_shape
        return arg_shapes[0].sharding

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=sharding_rule)
    return cp


def decode_attention_spmd(q, k_cache, v_cache, mask, *,
                          interpret: bool = False):
    """decode_attention under a mesh: batch shards on dp, kv heads on tp."""
    return _make(False, False, interpret)(q, k_cache, v_cache, mask)


def decode_attention_chunk_spmd(q, k_cache, v_cache, mask, *,
                                interpret: bool = False):
    return _make(False, True, interpret)(q, k_cache, v_cache, mask)


def decode_attention_int8_spmd(q, k_cache, v_cache, kv_scale, mask, *,
                               interpret: bool = False):
    return _make(True, False, interpret)(q, k_cache, v_cache, kv_scale,
                                         mask)


def decode_attention_int8_chunk_spmd(q, k_cache, v_cache, kv_scale, mask,
                                     *, interpret: bool = False):
    return _make(True, True, interpret)(q, k_cache, v_cache, kv_scale,
                                        mask)


# ---------------------------------------------------------------------------
# conv0 frontend kernel under a mesh: purely batch-parallel (weights/LN
# params are tiny and replicated; fused LN normalizes over the FULL channel
# dim, so channels must not shard). Wrapped unconditionally by
# conv_frontend._conv0_p — the single-device passthrough is bitwise.
# ---------------------------------------------------------------------------

_CONV0_RULE = "b s, o u k, oo, og, ob -> b t oz"
_CONV0_NEED = ("s", "o", "u", "k", "oo", "og", "ob", "t", "oz")


@functools.lru_cache(maxsize=None)
def _conv0_cp(stride, eps, fuse_ln, fuse_act, interpret):
    from mtasr_tpu.ops.pallas import conv_frontend as _cf

    def fn(wave, weight, bias, gamma, beta):
        return _cf._conv0_kernel_call(wave, weight, bias, gamma, beta,
                                      stride, eps, fuse_ln, fuse_act,
                                      interpret)

    cp = custom_partitioning(fn)

    def sharding_rule(mesh, value_types, result_types):
        del mesh, value_types, result_types
        return _CONV0_RULE, dict(need_replication_factors=_CONV0_NEED)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(a.sharding for a in arg_shapes)
        return mesh, fn, result_shape.sharding, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        del mesh, result_shape
        return arg_shapes[0].sharding

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer_sharding_from_operands,
                     sharding_rule=sharding_rule)
    return cp


def conv0_kernel_spmd(wave, weight, bias, gamma, beta, *, stride, eps,
                      fuse_ln, fuse_act, interpret):
    return _conv0_cp(stride, eps, fuse_ln, fuse_act, interpret)(
        wave, weight, bias, gamma, beta)


# ---------------------------------------------------------------------------
# Flash attention (the WavLM encoder kernel) under a mesh.
#
# Training on a pod runs the encoder's flash forward AND its 3-kernel Pallas
# backward inside the pjit'd train step; both are Mosaic custom calls with
# the same partitioning blind spot as the decode kernels. Rules: batch on
# any axes, heads at kv-head granularity (the encoder is MHA, g = 1, but the
# GQA compounds keep the rule general), T/S/D replicated (utterances are
# <= 20 s — SURVEY §5 long-context note — so sequence stays on-chip).
#
# The one cross-shard reduction: pos_bias is shared across the batch, so its
# gradient sums over batch rows — each shard psums its local dpb over the
# batch mesh axes inside the per-shard lowering (dq/dk/dv/dg stay local).
# ---------------------------------------------------------------------------

def _flash_rule(value_types, bwd: bool):
    """(rule, kwargs) for the flash fwd/bwd partition. The GQA compound
    (kv g) collapses to a plain kv factor for MHA — Shardy rejects
    size-1 factors inside compounds (the encoder is MHA, g = 1)."""
    q_shape = _dims(value_types[0])
    g = q_shape[2] // _dims(value_types[1])[2]
    hq = "(kv g)" if g > 1 else "kv"
    q_m, c_m = f"b t {hq} d", "b s kv dk"
    pb_m, g_m, lse_m = f"{hq} t s", f"b {hq} t", f"b {hq} o t"
    ops = [q_m, c_m, c_m, "b", pb_m, g_m]
    res = [q_m, lse_m]
    if bwd:
        ops += [q_m, lse_m, q_m]
        res = [q_m, c_m, c_m, pb_m, g_m]
    need = ("t",) + (("g",) if g > 1 else ()) + ("d", "s", "dk", "o")
    kw = dict(need_replication_factors=need)
    if g > 1:
        kw["g"] = g
    return ", ".join(ops) + " -> " + ", ".join(res), kw


def _batch_axes(arg_shapes):
    """Mesh axis names sharding q's batch dim (dim 0)."""
    spec = arg_shapes[0].sharding.spec
    if not spec or spec[0] is None:
        return ()
    b = spec[0]
    return tuple(b) if isinstance(b, tuple) else (b,)


@functools.lru_cache(maxsize=None)
def _flash_fwd_cp(scale, causal, q_offset, block_q, block_k, interpret):
    from mtasr_tpu.ops.pallas import flash_attention as _fa

    def fn(q, k, v, kv_lens, pos_bias, gate):
        out, lse = _fa._flash_forward(
            q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
            block_q, block_k, interpret)
        B, T, Hq, _ = q.shape
        # lse rides fused [B*Hq, 1, T] inside the kernel; unfuse at the
        # partition boundary so its dims carry separate b / head factors
        return out, lse.reshape(B, Hq, 1, T)

    cp = custom_partitioning(fn)

    def sharding_rule(mesh, value_types, result_types):
        del mesh, result_types
        return _flash_rule(value_types, bwd=False)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(a.sharding for a in arg_shapes)
        out_shardings = tuple(r.sharding for r in result_shape)
        return mesh, fn, out_shardings, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        del mesh
        q_s = arg_shapes[0].sharding
        return tuple(q_s for _ in result_shape)

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer_sharding_from_operands,
                     sharding_rule=sharding_rule)
    return cp


@functools.lru_cache(maxsize=None)
def _flash_bwd_cp(scale, causal, q_offset, block_q, block_k, interpret):
    from mtasr_tpu.ops.pallas import flash_attention as _fa

    def fn(q, k, v, kv_lens, pos_bias, gate, out, lse4, g_out):
        B, T, Hq, _ = q.shape
        lse = lse4.reshape(B * Hq, 1, T)
        return _fa._flash_backward(
            q, k, v, kv_lens, pos_bias, gate, out, lse, g_out, scale,
            causal, q_offset, block_q, block_k, interpret)

    cp = custom_partitioning(fn)

    def sharding_rule(mesh, value_types, result_types):
        del mesh, result_types
        return _flash_rule(value_types, bwd=True)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(a.sharding for a in arg_shapes)
        out_shardings = tuple(r.sharding for r in result_shape)
        baxes = _batch_axes(arg_shapes)

        def lower_fn(*ops):
            dq, dk, dv, dpb, dg = fn(*ops)
            if baxes:
                # pos_bias is batch-shared: its grad reduces over the
                # batch rows this shard does not hold
                dpb = jax.lax.psum(dpb, baxes)
            return dq, dk, dv, dpb, dg

        return mesh, lower_fn, out_shardings, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        del mesh
        shardings = tuple(a.sharding for a in arg_shapes)
        # dq/dk/dv/dg mirror their primals; dpb mirrors pos_bias
        return (shardings[0], shardings[1], shardings[2], shardings[4],
                shardings[5])

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer_sharding_from_operands,
                     sharding_rule=sharding_rule)
    return cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash_spmd(q, k, v, kv_lens, pos_bias, gate, scale, causal, q_offset,
                block_q, block_k, interpret):
    out, _ = _flash_fwd_cp(scale, causal, q_offset, block_q, block_k,
                           interpret)(q, k, v, kv_lens, pos_bias, gate)
    return out


def _flash_spmd_fwd(q, k, v, kv_lens, pos_bias, gate, scale, causal,
                    q_offset, block_q, block_k, interpret):
    out, lse4 = _flash_fwd_cp(scale, causal, q_offset, block_q, block_k,
                              interpret)(q, k, v, kv_lens, pos_bias, gate)
    return out, (q, k, v, kv_lens, pos_bias, gate, out, lse4)


def _flash_spmd_bwd(scale, causal, q_offset, block_q, block_k, interpret,
                    res, g_out):
    q, k, v, kv_lens, pos_bias, gate, out, lse4 = res
    dq, dk, dv, dpb, dg = _flash_bwd_cp(
        scale, causal, q_offset, block_q, block_k, interpret)(
            q, k, v, kv_lens, pos_bias, gate, out, lse4, g_out)
    return dq, dk, dv, None, dpb, dg


_flash_spmd.defvjp(_flash_spmd_fwd, _flash_spmd_bwd)


def flash_attention_spmd(q, k, v, *, kv_lens=None, pos_bias=None, gate=None,
                         scale=None, causal: bool = False, q_offset: int = 0,
                         block_q: int = 512, block_k: int = 512,
                         interpret: bool = False):
    """flash_attention under a mesh (batch on dp, heads on tp).

    Requires pos_bias (the encoder's gated rel-pos form — the only flash
    call site that runs under a mesh); no-bias callers use XLA attention
    there. kv_lens is synthesized when None so the partitioned op has a
    fixed operand list.
    """
    if pos_bias is None:
        raise ValueError("flash_attention_spmd requires pos_bias "
                         "(encoder gated rel-pos form)")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if gate is None:
        gate = jnp.ones((q.shape[0], q.shape[2], q.shape[1]), q.dtype)
    if kv_lens is None:
        kv_lens = jnp.full((q.shape[0],), k.shape[1], jnp.int32)
    return _flash_spmd(q, k, v, kv_lens.astype(jnp.int32), pos_bias, gate,
                       scale, causal, q_offset, block_q, block_k, interpret)
