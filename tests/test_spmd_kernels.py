"""SPMD partitioning of the Pallas decode kernels (ops/pallas/spmd.py).

A bare pallas_call is a Mosaic custom call the XLA/Shardy partitioner
cannot split — under a dp x tp mesh it would gather the whole KV cache
onto every device. The spmd wrappers register custom_partitioning rules
(batch on any axis, heads at kv-head granularity via Shardy compound
factors). These tests run on the 8-virtual-device CPU mesh: the rules,
shard-local geometry, and result assembly are exactly what a real pod
exercises (inside the partition the kernel sees single-device shapes —
the regime tests/test_decode_attention.py validates), with the kernels in
interpret mode on CPU. No reference counterpart: the reference never
shards the model (inference_asr_gpus.py is NCCL data sharding only).
"""
import functools
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.nn import dot_product_attention
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtasr_tpu.ops.pallas import spmd

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-virtual-device CPU mesh")


def _mesh(dp, tp):
    return Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("data", "model"))


def _case(key, B, S, Hq, Hkv, D, L=None, int8=False):
    """Build (operands, reference) for one kernel variant."""
    q_shape = (B, L, Hq, D) if L else (B, Hq, D)
    q = jax.random.normal(key, q_shape, jnp.float32)
    mask = np.ones((B, S), bool)
    mask[:, -3:] = False
    mask[1, 4] = False
    if L:
        mask = np.repeat(mask[:, None], L, 1)
        for pos in range(L):                     # within-chunk causality
            mask[:, pos, S - (L - 1 - pos):] = False
    mask = jnp.asarray(mask)
    if int8:
        k8 = jax.random.randint(jax.random.fold_in(key, 1),
                                (B, S, Hkv, D), -127, 128, jnp.int8)
        v8 = jax.random.randint(jax.random.fold_in(key, 2),
                                (B, S, Hkv, D), -127, 128, jnp.int8)
        ks = jax.random.uniform(jax.random.fold_in(key, 3), (B, S, Hkv),
                                jnp.float32, 0.005, 0.02
                                ).astype(jnp.bfloat16).astype(jnp.float32)
        vs = jax.random.uniform(jax.random.fold_in(key, 4), (B, S, Hkv),
                                jnp.float32, 0.005, 0.02
                                ).astype(jnp.bfloat16).astype(jnp.float32)
        kf = k8.astype(jnp.float32) * ks[..., None]
        vf = v8.astype(jnp.float32) * vs[..., None]
        kvs = jnp.swapaxes(jnp.stack([ks, vs], -1).reshape(B, S, -1),
                           1, 2).astype(jnp.bfloat16)
        ops = (q, k8.reshape(B, S, Hkv * D), v8.reshape(B, S, Hkv * D),
               kvs, mask)
    else:
        kf = jax.random.normal(jax.random.fold_in(key, 1),
                               (B, S, Hkv, D), jnp.float32)
        vf = jax.random.normal(jax.random.fold_in(key, 2),
                               (B, S, Hkv, D), jnp.float32)
        ops = (q, kf.reshape(B, S, Hkv * D), vf.reshape(B, S, Hkv * D),
               mask)
    mm = mask[:, None] if L else mask[:, None, None, :]
    qq = q if L else q[:, None]
    ref = dot_product_attention(qq, kf, vf, mask=mm)
    return ops, (ref if L else ref[:, 0])


def _shard(mesh, ops, int8):
    """Production shardings: batch on data, kv heads on model."""
    head = P("data", "model", None) if len(ops[0].shape) == 3 \
        else P("data", None, "model", None)
    cache = P("data", None, "model")
    mask = P("data", None) if ops[-1].ndim == 2 else P("data", None, None)
    specs = [head, cache, cache] \
        + ([P("data", "model", None)] if int8 else []) + [mask]
    return tuple(jax.device_put(o, NamedSharding(mesh, s))
                 for o, s in zip(ops, specs))


FNS = {
    (False, False): spmd.decode_attention_spmd,
    (False, True): spmd.decode_attention_chunk_spmd,
    (True, False): spmd.decode_attention_int8_spmd,
    (True, True): spmd.decode_attention_int8_chunk_spmd,
}


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("chunk", [False, True])
def test_sharded_matches_unsharded(int8, chunk):
    """dp=2 x tp=2 sharding: per-shard Hkv=2, lanes=128 (kernel path).
    Output must equal the unsharded reference, with NO gather of the
    cache operands in the compiled HLO."""
    fn = FNS[(int8, chunk)]
    ops, ref = _case(jax.random.key(0), B=4, S=32, Hq=8, Hkv=4, D=64,
                     L=3 if chunk else None, int8=int8)
    mesh = _mesh(2, 2)
    sharded = _shard(mesh, ops, int8)
    # pin the output to q's sharding (as the consuming o_proj would):
    # with it pinned, a gather-free HLO proves the op ran fully sharded
    jf = jax.jit(lambda *o: fn(*o, interpret=True),
                 out_shardings=sharded[0].sharding)
    out = jf(*sharded)
    tol = dict(rtol=2e-2, atol=2e-2) if int8 else dict(rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **tol)
    # the whole point: no all-gather of the cache
    hlo = jf.lower(*sharded).compile().as_text()
    assert not re.search(r"all-gather", hlo), "cache was gathered"
    assert out.sharding.spec == sharded[0].sharding.spec


@pytest.mark.parametrize("int8", [False, True])
def test_unsupported_geometry_falls_back_sharded(int8):
    """tp=4 on Hkv=4 leaves 64 merged lanes per shard — below the
    kernel's 128-lane floor. The partition must still run SHARDED via the
    XLA reference fallback (correct output, no gather), never gather."""
    fn = FNS[(int8, False)]
    ops, ref = _case(jax.random.key(1), B=4, S=32, Hq=8, Hkv=4, D=64,
                     int8=int8)
    mesh = _mesh(2, 4)
    sharded = _shard(mesh, ops, int8)
    jf = jax.jit(lambda *o: fn(*o, interpret=True))
    out = jf(*sharded)
    tol = dict(rtol=2e-2, atol=2e-2) if int8 else dict(rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **tol)
    hlo = jf.lower(*sharded).compile().as_text()
    assert not re.search(r"all-gather", hlo)


def test_single_device_passthrough():
    """No mesh, plain jit: the wrapper must behave exactly like the
    direct kernel call (the default single-chip serving path)."""
    from mtasr_tpu.ops.pallas.decode_attention import decode_attention
    ops, _ = _case(jax.random.key(2), B=2, S=16, Hq=8, Hkv=4, D=64)
    direct = decode_attention(*ops, interpret=True)
    wrapped = jax.jit(
        lambda *o: spmd.decode_attention_spmd(*o, interpret=True))(*ops)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(wrapped))


def _flash_case(B=4, T=64, S=64, H=4, D=32, seed=0):
    key = jax.random.key(seed)
    q = jax.random.normal(key, (B, T, H, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, D),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, D),
                          jnp.float32)
    pos_bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 3),
                                       (H, T, S), jnp.float32)
    gate = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(key, 4),
                                            (B, H, T), jnp.float32))
    kv_lens = jnp.asarray([S, S - 7, S - 3, S] * (B // 4), jnp.int32)
    return q, k, v, kv_lens, pos_bias, gate


def _flash_shard(mesh, ops):
    specs = (P("data", None, "model", None),     # q
             P("data", None, "model", None),     # k
             P("data", None, "model", None),     # v
             P("data",),                          # kv_lens
             P("model", None, None),              # pos_bias
             P("data", "model", None))            # gate
    return tuple(jax.device_put(o, NamedSharding(mesh, s))
                 for o, s in zip(ops, specs))


def test_flash_spmd_forward_matches_unsharded():
    """Encoder flash attention under dp x tp: per-device kernel calls on
    shard-local (batch, head) slices must reproduce the unsharded output,
    with no gather of q/k/v in the compiled HLO."""
    from mtasr_tpu.ops.pallas.flash_attention import flash_attention
    from mtasr_tpu.ops.pallas.spmd import flash_attention_spmd
    ops = _flash_case()
    q, k, v, kv_lens, pos_bias, gate = ops
    ref = flash_attention(q, k, v, kv_lens=kv_lens, pos_bias=pos_bias,
                          gate=gate, interpret=True)
    mesh = _mesh(2, 2)
    sharded = _flash_shard(mesh, ops)
    jf = jax.jit(lambda *o: flash_attention_spmd(
        o[0], o[1], o[2], kv_lens=o[3], pos_bias=o[4], gate=o[5],
        interpret=True), out_shardings=sharded[0].sharding)
    out = jf(*sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    hlo = jf.lower(*sharded).compile().as_text()
    assert not re.search(r"all-gather", hlo)


def test_flash_spmd_grads_match_unsharded():
    """The 3-kernel Pallas backward under the mesh: dq/dk/dv/dgate are
    shard-local; dpos_bias reduces over batch rows (the per-shard psum in
    ops/pallas/spmd.py) — all five must match the unsharded grads."""
    from mtasr_tpu.ops.pallas.flash_attention import flash_attention
    from mtasr_tpu.ops.pallas.spmd import flash_attention_spmd
    ops = _flash_case(seed=5)
    q, k, v, kv_lens, pos_bias, gate = ops

    def loss(fa, q, k, v, pb, g):
        out = fa(q, k, v, kv_lens=kv_lens, pos_bias=pb, gate=g,
                 interpret=True)
        return jnp.sum(out * out)

    ref = jax.grad(functools.partial(loss, flash_attention),
                   argnums=(0, 1, 2, 3, 4))(q, k, v, pos_bias, gate)

    mesh = _mesh(2, 2)
    qs, ks, vs, _, pbs, gs = _flash_shard(mesh, ops)
    got = jax.jit(jax.grad(
        functools.partial(loss, flash_attention_spmd),
        argnums=(0, 1, 2, 3, 4)))(qs, ks, vs, pbs, gs)
    names = ("dq", "dk", "dv", "dpos_bias", "dgate")
    for n, r, g in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-4, atol=5e-4, err_msg=n)


def test_wavlm_flash_spmd_encoder_matches():
    """wavlm_forward with attention_impl='flash_spmd' on a dp x tp mesh
    must match the single-device XLA path (what Trainer/inference select
    under a mesh)."""
    from mtasr_tpu.config import WavLMConfig
    from mtasr_tpu.models.wavlm import init_wavlm_params, wavlm_forward
    from mtasr_tpu.parallel.mesh import shard_params

    def mk(impl):
        return WavLMConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, conv_dim=(16, 16), conv_stride=(5, 2),
            conv_kernel=(10, 3), num_buckets=16, max_bucket_distance=20,
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
            add_adapter=True, num_adapter_layers=1, output_hidden_size=32,
            mask_time_prob=0.0, hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, feat_proj_dropout=0.0,
            do_stable_layer_norm=True, feat_extract_norm="layer",
            conv_bias=True, attention_impl=impl)

    params = init_wavlm_params(jax.random.key(0), mk("xla"))
    B, S = 4, 4000
    wav = jax.random.normal(jax.random.key(1), (B, S), jnp.float32)
    am = jnp.ones((B, S), jnp.int32)
    ref = wavlm_forward(params, mk("xla"), wav, am)

    mesh = _mesh(2, 2)
    sp = shard_params({"encoder": params}, mesh)["encoder"]
    ws = jax.device_put(wav, NamedSharding(mesh, P("data", None)))
    ams = jax.device_put(am, NamedSharding(mesh, P("data", None)))
    got = jax.jit(lambda p, w, a: wavlm_forward(
        p, mk("flash_spmd"), w, a))(sp, ws, ams)
    np.testing.assert_allclose(
        np.asarray(got.last_hidden_state),
        np.asarray(ref.last_hidden_state), rtol=2e-4, atol=2e-4)


def test_trainer_selects_spmd_impls_under_mesh():
    """Trainer must flip the Pallas impls to their SPMD variants when a
    mesh is active (decode always; flash only on non-CPU backends, where
    auto would have picked the compiled kernel)."""
    from mtasr_tpu.config import DataConfig, TrainingConfig
    from mtasr_tpu.models.speech_encoder_decoder import init_model_params
    from mtasr_tpu.parallel.mesh import make_mesh
    from mtasr_tpu.train.loop import Trainer
    from tests.test_composite import tiny_cfg

    cfg = tiny_cfg(train_mode="attention", talker_ctc=False)
    params = init_model_params(jax.random.key(0), cfg)
    mesh = make_mesh(dp_size=4, tp_size=2, devices=jax.devices()[:8])
    tc = TrainingConfig(learning_rate=1e-3, warmup_steps=1, max_steps=2)
    Trainer(cfg, tc, DataConfig(), params,
            freeze_kwargs={"train_all": True}, mesh=mesh)
    assert cfg.decoder.decode_attn_impl == "pallas_spmd"
    # on the CPU backend 'auto' resolves to xla, so it must NOT flip
    assert cfg.encoder.attention_impl == "auto"


def test_conv0_kernel_batch_sharded():
    """The conv0 frontend kernel is wrapped unconditionally in a
    batch-parallel custom_partitioning rule (conv_frontend._conv0_p):
    batch-sharded waveform input must produce the bitwise-unsharded
    output with no gather."""
    from mtasr_tpu.ops.pallas.conv_frontend import conv0_fused
    B, S, O, K, stride = 4, 12800, 512, 10, 5
    key = jax.random.key(0)
    wave = jax.random.normal(key, (B, S), jnp.float32)
    w = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (O, 1, K),
                                jnp.float32)
    b = 0.01 * jax.random.normal(jax.random.fold_in(key, 2), (O,),
                                 jnp.float32)
    g, be = jnp.ones((O,), jnp.float32), jnp.zeros((O,), jnp.float32)
    ref = conv0_fused(wave, w, b, g, be, stride=stride, interpret=True)
    mesh = _mesh(4, 2)
    ws = jax.device_put(wave, NamedSharding(mesh, P("data", None)))
    jf = jax.jit(lambda wv: conv0_fused(wv, w, b, g, be, stride=stride,
                                        interpret=True))
    out = jf(ws)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert not re.search(r"all-gather", jf.lower(ws).compile().as_text())


def test_train_step_flash_spmd_scan_remat_under_mesh():
    """Pod-training composition: flash_spmd inside scan_layers + remat
    inside the pjit'd train step on a dp x tp mesh. The loss/grads must
    match the XLA-attention path (what the CPU dryrun runs) — this is the
    config Trainer selects on real multi-chip TPU hardware."""
    from mtasr_tpu.config import TrainingConfig
    from mtasr_tpu.models.speech_encoder_decoder import init_model_params
    from mtasr_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from mtasr_tpu.train.freeze import trainable_mask
    from mtasr_tpu.train.optimizer import make_optimizer
    from mtasr_tpu.train.train_step import make_train_step
    from tests.test_composite import make_batch, tiny_cfg

    losses = {}
    for impl in ("xla", "flash_spmd"):
        cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
        cfg.encoder.attention_impl = impl
        cfg.encoder.num_hidden_layers = 3   # >1 so scan actually engages
        cfg.encoder.scan_layers = True
        cfg.encoder.remat = True
        params = init_model_params(jax.random.key(0), cfg)
        wav, amask, arr = make_batch(cfg, B=4, seed=2)
        batch = {"input_values": jnp.asarray(wav),
                 "audio_mask": jnp.asarray(amask),
                 "decoder_input_ids": jnp.asarray(
                     arr["decoder_input_ids"], jnp.int32),
                 "ce_labels": jnp.asarray(arr["ce_labels"], jnp.int32),
                 "label_spks": jnp.asarray(arr["label_spks"], jnp.int32),
                 "label_spk_lens": jnp.asarray(
                     arr["label_spk_lens"], jnp.int32)}
        tc = TrainingConfig(pcgrad=True, learning_rate=1e-3,
                            warmup_steps=2, max_steps=10)
        mask = trainable_mask(params, train_mode=cfg.train_mode,
                              train_all=True)
        opt = make_optimizer(tc, mask)
        step = make_train_step(cfg, tc, opt, trainable_mask=mask,
                               donate=False)
        state = opt.init(params)
        if impl == "flash_spmd":
            mesh = _mesh(2, 2)
            params = shard_params(params, mesh)
            state = opt.init(params)
            batch = shard_batch(batch, mesh)
            with mesh:
                _, _, m = step(params, state, batch, jax.random.key(0))
                losses[impl] = float(m["loss"])
        else:
            _, _, m = step(params, state, batch, jax.random.key(0))
            losses[impl] = float(m["loss"])
    assert np.isfinite(losses["flash_spmd"])
    np.testing.assert_allclose(losses["flash_spmd"], losses["xla"],
                               rtol=2e-4)


@pytest.mark.parametrize("quantized", [False, True])
def test_llama_decode_spmd_under_mesh(quantized):
    """llama_forward with decode_attn_impl='pallas_spmd', params and
    batch sharded over dp x tp: logits must match the single-device XLA
    path (the engine-level integration inference_asr exercises). The
    quantized variant covers the int8 KV cache — its interleaved scale
    rows shard on the kv factor alongside the cache lanes."""
    from dataclasses import replace
    from mtasr_tpu.config import LlamaConfig
    from mtasr_tpu.models.llama import (
        KVCache, init_llama_params, llama_forward,
    )
    from mtasr_tpu.parallel.mesh import shard_params

    cfg = LlamaConfig(vocab_size=64, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=64)
    params = init_llama_params(jax.random.key(0), cfg)
    B, L0 = 4, 5
    emb = jax.random.normal(jax.random.key(1), (B, L0, 256), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L0)[None], (B, L0))

    def run(c, p, e):
        cache = KVCache.init(c, B, L0 + 2, quantized=quantized)
        lg, cache = llama_forward(p, c, e, pos, kv_cache=cache,
                                  cache_offset=0)
        # one decode step through the kernel/spmd path
        e1 = jax.random.normal(jax.random.key(2), (B, 1, 256), jnp.float32)
        lg1, _ = llama_forward(p, c, e1,
                               jnp.full((B, 1), L0, jnp.int32),
                               kv_cache=cache, cache_offset=L0)
        return lg1

    ref = run(replace(cfg, decode_attn_impl="xla"), params, emb)

    mesh = _mesh(2, 2)
    sp = shard_params({"decoder": params}, mesh)["decoder"]
    es = jax.device_put(emb, NamedSharding(mesh, P("data", None, None)))
    got = jax.jit(lambda p, e: run(
        replace(cfg, decode_attn_impl="pallas_spmd"), p, e))(sp, es)
    # int8: the sharded kernel quantizes q per-shard vs the XLA path's
    # dequantized einsum — same tolerance family as the kernel tests
    tol = (dict(rtol=3e-2, atol=3e-2) if quantized
           else dict(rtol=2e-4, atol=2e-4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)
