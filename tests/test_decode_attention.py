"""Pallas decode-step attention vs the XLA reference formulation.

The kernel (ops/pallas/decode_attention.py) replaces dot_product_attention
for the L=1 KV-cached decode step; these tests pin numerical parity in
interpret mode (CPU) including GQA head grouping and masked (invalid /
not-yet-written) cache slots, and that llama_forward's decode step routes
through it unchanged.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.ops.attention import dot_product_attention
from mtasr_tpu.ops.pallas.decode_attention import (
    decode_attention, supported,
)


@pytest.mark.parametrize("B,S,Hq,Hkv,D", [
    (4, 32, 8, 2, 64),     # GQA groups=4, HD=128
    (2, 17, 4, 4, 32),     # MHA, HD=128, ragged S
    (8, 64, 16, 2, 128),   # HD=256
])
def test_matches_xla_attention(B, S, Hq, Hkv, D):
    assert supported(Hq, Hkv, D)
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D),
                          jnp.float32)
    # ragged per-row validity with a hole (mid-sequence padding)
    mask = np.ones((B, S), bool)
    mask[0, S // 2] = False
    mask[:, S - 3:] = False
    mask[1, : S // 4] = False
    mask = jnp.asarray(mask)

    ref = dot_product_attention(q[:, None], k, v,
                                mask=mask[:, None, None, :])[:, 0]
    got = decode_attention(q, k.reshape(B, S, Hkv * D),
                           v.reshape(B, S, Hkv * D), mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int8_kernel_matches_dequantized_xla():
    """The int8 kernel folds scales into scores/probs; it must match the
    explicit dequantize-then-attend formulation exactly (same math, only
    the order of the scale multiplications differs)."""
    from mtasr_tpu.ops.pallas.decode_attention import decode_attention_int8
    B, S, Hq, Hkv, D = 4, 24, 8, 2, 64
    key = jax.random.key(3)
    q = jax.random.normal(key, (B, Hq, D), jnp.float32)
    k8 = jax.random.randint(jax.random.fold_in(key, 1),
                            (B, S, Hkv, D), -127, 128, jnp.int8)
    v8 = jax.random.randint(jax.random.fold_in(key, 2),
                            (B, S, Hkv, D), -127, 128, jnp.int8)
    # bf16 scale values (the cache stores scales in bf16 — use values
    # already representable so the reference dequant matches exactly)
    ks = jax.random.uniform(jax.random.fold_in(key, 3), (B, S, Hkv),
                            jnp.float32, 0.005, 0.02).astype(jnp.bfloat16
                            ).astype(jnp.float32)
    vs = jax.random.uniform(jax.random.fold_in(key, 4), (B, S, Hkv),
                            jnp.float32, 0.005, 0.02).astype(jnp.bfloat16
                            ).astype(jnp.float32)
    mask = np.ones((B, S), bool)
    mask[:, -4:] = False
    mask[2, 5] = False
    mask = jnp.asarray(mask)

    k = k8.astype(jnp.float32) * ks[..., None]
    v = v8.astype(jnp.float32) * vs[..., None]
    ref = dot_product_attention(q[:, None], k, v,
                                mask=mask[:, None, None, :])[:, 0]
    # scales are passed merged in the cache's native transposed
    # [B, 2*Hkv, S] layout (kv-major interleaved rows k_0, v_0, k_1, v_1)
    kvs = jnp.swapaxes(jnp.stack([ks, vs], axis=-1).reshape(
        ks.shape[0], ks.shape[1], -1), 1, 2).astype(jnp.bfloat16)
    got = decode_attention_int8(q, k8.reshape(B, S, Hkv * D),
                                v8.reshape(B, S, Hkv * D),
                                kvs, mask,
                                interpret=True)
    # kernel matmuls run bf16 on the MXU; interpret mode mirrors that
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_llama_int8_decode_routes_through_kernel():
    """--kv_quant decode under decode_attn_impl='pallas_interpret' must
    agree with the XLA int8 dequant path."""
    from dataclasses import replace
    from mtasr_tpu.config import LlamaConfig
    from mtasr_tpu.models.llama import (
        KVCache, init_llama_params, llama_forward,
    )
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=64)
    params = init_llama_params(jax.random.key(0), cfg)
    B, L0 = 2, 5
    emb = jax.random.normal(jax.random.key(1), (B, L0, 64), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L0)[None], (B, L0))
    logits = {}
    for impl in ("pallas_interpret", "xla"):
        c = replace(cfg, decode_attn_impl=impl)
        cache = KVCache.init(c, B, L0 + 2, quantized=True)
        _, cache = llama_forward(params, c, emb, pos, kv_cache=cache,
                                 cache_offset=0)
        e = jax.random.normal(jax.random.key(2), (B, 1, 64), jnp.float32)
        p = jnp.full((B, 1), L0)
        lg, cache = llama_forward(params, c, e, p, kv_cache=cache,
                                  cache_offset=L0)
        logits[impl] = np.asarray(lg)
    np.testing.assert_allclose(logits["pallas_interpret"], logits["xla"],
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("B,L,S,Hq,Hkv,D", [
    (4, 5, 32, 8, 2, 64),    # spec_k=4 verify chunk, GQA
    (2, 3, 17, 4, 4, 32),    # MHA, ragged S
])
def test_chunk_kernel_matches_xla(B, L, S, Hq, Hkv, D):
    """L-token chunk kernel (speculative verify) vs the XLA reference,
    with per-position masks including within-chunk causality and holes."""
    from mtasr_tpu.ops.pallas.decode_attention import decode_attention_chunk
    key = jax.random.key(7)
    q = jax.random.normal(key, (B, L, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D),
                          jnp.float32)
    # chunk written at offset c: position l attends prior valid slots and
    # chunk slots <= l; add holes (rejected-draft slots stay dead)
    c = S - L - 2
    mask = np.zeros((B, L, S), bool)
    for l in range(L):
        mask[:, l, : c + l + 1] = True
    mask[:, :, 3] = False                     # dead hole from a prior step
    mask[1, :, : 5] = False                   # ragged history
    mask = jnp.asarray(mask)

    ref = dot_product_attention(q, k, v, mask=mask[:, None])
    got = decode_attention_chunk(q, k.reshape(B, S, Hkv * D),
                                 v.reshape(B, S, Hkv * D), mask,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int8_chunk_kernel_matches_dequantized_xla():
    from mtasr_tpu.ops.pallas.decode_attention import (
        decode_attention_int8_chunk,
    )
    B, L, S, Hq, Hkv, D = 2, 4, 24, 8, 2, 64
    key = jax.random.key(11)
    q = jax.random.normal(key, (B, L, Hq, D), jnp.float32)
    k8 = jax.random.randint(jax.random.fold_in(key, 1),
                            (B, S, Hkv, D), -127, 128, jnp.int8)
    v8 = jax.random.randint(jax.random.fold_in(key, 2),
                            (B, S, Hkv, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(jax.random.fold_in(key, 3), (B, S, Hkv),
                            jnp.float32, 0.005, 0.02).astype(jnp.bfloat16
                            ).astype(jnp.float32)
    vs = jax.random.uniform(jax.random.fold_in(key, 4), (B, S, Hkv),
                            jnp.float32, 0.005, 0.02).astype(jnp.bfloat16
                            ).astype(jnp.float32)
    c = S - L - 3
    mask = np.zeros((B, L, S), bool)
    for l in range(L):
        mask[:, l, : c + l + 1] = True
    mask[0, :, 2] = False
    mask = jnp.asarray(mask)

    k = k8.astype(jnp.float32) * ks[..., None]
    v = v8.astype(jnp.float32) * vs[..., None]
    ref = dot_product_attention(q, k, v, mask=mask[:, None])
    # kv-major interleaved scale rows (k_0, v_0, k_1, v_1, …)
    kvs = jnp.swapaxes(jnp.stack([ks, vs], axis=-1).reshape(
        ks.shape[0], ks.shape[1], -1), 1, 2).astype(jnp.bfloat16)
    got = decode_attention_int8_chunk(
        q, k8.reshape(B, S, Hkv * D), v8.reshape(B, S, Hkv * D), kvs, mask,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_llama_chunk_step_routes_through_kernel():
    """llama_forward with a cache and 1 < L <= 16 (the speculative verify
    chunk) must agree between the chunk kernel and the XLA path."""
    from dataclasses import replace
    from mtasr_tpu.config import LlamaConfig
    from mtasr_tpu.models.llama import (
        KVCache, init_llama_params, llama_forward,
    )
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=64)
    params = init_llama_params(jax.random.key(0), cfg)
    B, L0, Lc = 2, 6, 3
    emb = jax.random.normal(jax.random.key(1), (B, L0, 64), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L0)[None], (B, L0))
    for quant in (False, True):
        logits = {}
        for impl in ("pallas_interpret", "xla"):
            c = replace(cfg, decode_attn_impl=impl)
            cache = KVCache.init(c, B, L0 + Lc + 1, quantized=quant,
                                 dtype=jnp.float32)
            _, cache = llama_forward(params, c, emb, pos, kv_cache=cache,
                                     cache_offset=0)
            e = jax.random.normal(jax.random.key(2), (B, Lc, 64),
                                  jnp.float32)
            p = L0 + jnp.broadcast_to(jnp.arange(Lc)[None], (B, Lc))
            lg, cache = llama_forward(params, c, e, p, kv_cache=cache,
                                      cache_offset=L0)
            logits[impl] = np.asarray(lg)
        tol = 2e-2 if quant else 1e-5
        np.testing.assert_allclose(logits["pallas_interpret"],
                                   logits["xla"], rtol=tol, atol=tol,
                                   err_msg=f"quant={quant}")


def test_unsupported_geometry_detected():
    assert not supported(8, 3, 64)      # Hq not divisible by Hkv
    assert not supported(4, 1, 64)      # HD=64 not lane-aligned
    assert supported(32, 8, 64)         # flagship 1B geometry


def test_llama_decode_step_routes_through_kernel():
    """llama_forward with a cache and L=1 must produce identical logits
    under decode_attn_impl='pallas' (interpret on CPU) and 'xla'."""
    from dataclasses import replace
    from mtasr_tpu.config import LlamaConfig
    from mtasr_tpu.models.llama import (
        KVCache, init_llama_params, llama_forward,
    )
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=64,
                      decode_attn_impl="pallas_interpret")
    assert supported(4, 2, 64)
    params = init_llama_params(jax.random.key(0), cfg)
    B, L0 = 2, 6
    emb = jax.random.normal(jax.random.key(1), (B, L0, 64), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L0)[None], (B, L0))

    outs = {}
    for impl in ("pallas_interpret", "xla"):
        c = replace(cfg, decode_attn_impl=impl)
        cache = KVCache.init(c, B, L0 + 3, dtype=jnp.float32)
        logits, cache = llama_forward(params, c, emb, pos, kv_cache=cache,
                                      cache_offset=0)
        toks = [jnp.argmax(logits[:, -1], -1)]
        for t in range(2):
            e = jax.random.normal(jax.random.fold_in(jax.random.key(2), t),
                                  (B, 1, 64), jnp.float32)
            p = jnp.full((B, 1), L0 + t)
            logits, cache = llama_forward(params, c, e, p, kv_cache=cache,
                                          cache_offset=L0 + t)
            toks.append(jnp.argmax(logits[:, -1], -1))
        outs[impl] = (np.asarray(logits), np.stack([np.asarray(x)
                                                    for x in toks]))
    np.testing.assert_allclose(outs["pallas_interpret"][0], outs["xla"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(outs["pallas_interpret"][1],
                                  outs["xla"][1])
