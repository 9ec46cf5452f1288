"""Flash-kernel core attribution at the encoder bench shape (VERDICT r4 #6).

DESIGN.md round 3 parked the encoder flash kernel at ~4.8 ms/layer vs
~0.8 FLOPs-ideal with a hypothesis list (QK contracts K=head_dim=64 — half
the MXU pipeline; f32 softmax VPU chain over [A, bq, S]; p@v produces
N=64 lanes). This harness converts the hypotheses into a measured table:
it clones the production single-S-block kernel (_flash_kernel_1s,
ops/pallas/flash_attention.py:115) with stages individually disabled and
times each variant at the exact encoder shape (B=128, T=S=499, H=16,
D=64, gated rel-pos bias on — WavLM-Large at the bench batch).

Modes:
  full        production kernel body
  no_bias     skip the gated rel-pos bias add (bias still fetched)
  no_softmax  p = s (skip max/exp/sum/div)
  no_qk       s replaced by a cheap broadcast (skip the QK matmul)
  no_pv       skip the p@v matmul (write p's first D lanes)
  bf16_exp    exp computed in bf16 (half the VPU softmax bytes)

Run standalone on the chip: python benchmarks/flash_profile.py
"""
import functools
import math
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

MODES = ("full", "no_bias", "no_softmax", "no_qk", "no_pv", "bf16_exp",
         "io_only", "qk_only")


def _kernel_1s_variant(kv_len_ref, q_ref, k_ref, v_ref, pos_bias_ref,
                       gate_ref, o_ref, lse_ref, *, scale, block_q, S, A,
                       mode):
    """_flash_kernel_1s's unmasked non-causal body (the bench-shape path:
    bucketed full-length rows) with stages disabled per `mode`."""
    import jax
    import jax.numpy as jnp

    NEG_INF = -1e30
    q = q_ref[:]                               # [A, bq, D]
    k = k_ref[:]                               # [A, S, D]
    v = v_ref[:]
    D = q.shape[-1]

    if mode == "io_only":
        # scaffold baseline: every input block is still DMA'd (specs are
        # identical), no compute — isolates dispatch + HBM movement +
        # the per-call transposes outside the kernel
        o_ref[:] = (q + k[:, :q.shape[1]] * 0 + v[:, :q.shape[1]] * 0
                    ).astype(o_ref.dtype)
        lse_ref[:] = jnp.zeros_like(lse_ref)
        return

    if mode == "no_qk":
        s = jnp.broadcast_to(q[:, :, :1], (A, q.shape[1], S)).astype(
            jnp.float32)
    else:
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale

    if mode == "qk_only":
        # QK + block IO, nothing else: QK cost ~= qk_only - io_only
        o_ref[:] = s[:, :, :D].astype(o_ref.dtype)
        lse_ref[:] = jnp.zeros_like(lse_ref)
        return

    if mode != "no_bias":
        pb = pos_bias_ref[:].astype(jnp.float32)       # [A, bq, S]
        g = gate_ref[:].astype(jnp.float32)            # [A, 1, bq]
        s = s + jnp.swapaxes(g, 1, 2) * pb

    if mode == "no_softmax":
        p = s
        l = jnp.sum(s[:, :, :1], axis=-1, keepdims=True)  # cheap stand-in
        m = l
    else:
        m = jnp.max(s, axis=-1, keepdims=True)             # [A, bq, 1]
        if mode == "bf16_exp":
            p = jnp.exp((s - m).astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)

    denom = jnp.where(l == 0.0, 1.0, l)
    if mode == "no_pv":
        o_ref[:] = (p[:, :, :D] / denom).astype(o_ref.dtype)
    else:
        out = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = (out / denom).astype(o_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    lse = jnp.where(l == 0.0, NEG_INF, lse)
    lse_ref[:] = jnp.swapaxes(lse, 1, 2)               # [A, 1, bq]


def _forward_variant(q, k, v, pos_bias, gate, scale, block_q, mode):
    """Clone of _flash_forward_1s's dispatch (flash_attention.py:190) for
    the variant kernels."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, Hq, D = q.shape
    S = k.shape[1]
    A = next(a for a in (8, 4, 2, 1) if Hq % a == 0
             and 2 * a * (3 * S * 128 + block_q * S) * 2 <= 12 * 1024 * 1024)
    block_q = min(block_q, T)
    kernel_scale = float(scale)
    frac = math.frexp(kernel_scale)[0] if kernel_scale > 0 else 0.0
    if frac == 0.5:
        q = q * jnp.asarray(kernel_scale, q.dtype)
        kernel_scale = 1.0
    q_f = q.transpose(0, 2, 1, 3).reshape(B * Hq, T, D)
    k_f = k.transpose(0, 2, 1, 3).reshape(B * Hq, S, D)
    v_f = v.transpose(0, 2, 1, 3).reshape(B * Hq, S, D)
    grid = (Hq // A, pl.cdiv(T, block_q), B)
    gate_f = gate.reshape(B * Hq, 1, T)
    pos_bias = pos_bias.astype(q.dtype)
    kv_lens = jnp.full((B,), S, jnp.int32)

    kernel = functools.partial(
        _kernel_1s_variant, scale=kernel_scale, block_q=block_q, S=S, A=A,
        mode=mode)
    Hq_over_A = Hq // A
    in_specs = [
        pl.BlockSpec((A, block_q, D),
                     lambda hg, i, b, kv: (b * Hq_over_A + hg, i, 0)),
        pl.BlockSpec((A, S, D),
                     lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, 0)),
        pl.BlockSpec((A, S, D),
                     lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, 0)),
        pl.BlockSpec((A, block_q, S), lambda hg, i, b, kv: (hg, i, 0)),
        pl.BlockSpec((A, 1, block_q),
                     lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, i)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((A, block_q, D),
                         lambda hg, i, b, kv: (b * Hq_over_A + hg, i, 0)),
            pl.BlockSpec((A, 1, block_q),
                         lambda hg, i, b, kv: (b * Hq_over_A + hg, 0, i)),
        ])
    out, lse = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * Hq, T, D), q.dtype),
                   jax.ShapeDtypeStruct((B * Hq, 1, T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(kv_lens, q_f, k_f, v_f, pos_bias, gate_f)
    return out.reshape(B, Hq, T, D).transpose(0, 2, 1, 3)


def run(B=128, T=499, H=16, D=64, iters=10, inner=8, modes=MODES):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    pb = jnp.asarray(rng.standard_normal((H, T, T)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(rng.uniform(0, 1, (B, H, T)), jnp.bfloat16)
    scale = 1.0 / math.sqrt(D)

    results = {}
    for mode in modes:
        @functools.partial(jax.jit, static_argnames=("mode",))
        def rep(qq, kk, vv, pbb, gg, mode=mode):
            # thread the output back through the input with a barrier so
            # XLA can neither hoist nor elide the inner iterations
            # (closed-over arrays would be inlined as HLO constants and
            # blow the remote-compile payload limit — pass everything)
            def body(c, _):
                o = _forward_variant(c, kk, vv, pbb, gg, scale, 512, mode)
                c = jax.lax.optimization_barrier(o.astype(jnp.bfloat16))
                return c, ()
            c, _ = jax.lax.scan(body, qq, None, length=inner)
            # reduce on-device: the timed host fetch must be a SCALAR —
            # fetching the [B,T,H,D] output (1 GB) through the tunnel
            # costs ~2.3 s and would swamp the kernel time
            return jnp.sum(c.astype(jnp.float32))

        float(rep(q, k, v, pb, g, mode=mode))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            # scalar value fetch: required on this runtime
            float(rep(q, k, v, pb, g, mode=mode))
        dt = (time.perf_counter() - t0) / (iters * inner)
        results[mode] = dt * 1e3
        print(f"{mode:12s} {dt * 1e3:7.3f} ms", flush=True)

    if "full" in results and len(results) == len(MODES):
        f = results["full"]
        print("\nattribution (ms, B=%d T=%d H=%d D=%d):" % (B, T, H, D))
        print(f"  QK matmul      : {f - results['no_qk']:.3f}")
        print(f"  softmax chain  : {f - results['no_softmax']:.3f}")
        print(f"  p@v matmul     : {f - results['no_pv']:.3f}")
        print(f"  bias add       : {f - results['no_bias']:.3f}")
        print(f"  bf16 exp delta : {f - results['bf16_exp']:.3f}")
        print(f"  full           : {f:.3f}")
    return results


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    run(modes=tuple(sys.argv[1:]) or MODES)
