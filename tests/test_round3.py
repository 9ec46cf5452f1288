"""Round-3 regression tests for VERDICT r2 findings:

* int8 KV cache must keep its quantization scales through llama_forward
  (round-2 dropped them at the cache rebuild, so --kv_quant decoded garbage)
  and kv_quant logits must track bf16-cache logits closely.
* scan_layers must compose with LoRA (round-2 silently fell back to the
  unrolled loop for the flagship recipe).
* LoRA dropout streams must be bitwise-identical across process restarts
  (round-2 folded hash(name), which Python salts per process).
"""
import subprocess
import sys
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from mtasr_tpu.config import LlamaConfig
from mtasr_tpu.models.llama import (
    KVCache, embed_tokens, init_llama_params, llama_forward,
)
from mtasr_tpu.train.lora import init_decoder_lora


def _mid_cfg(**kw):
    """Realistically-shaped (not flagship-sized) decoder: wide enough that
    int8 KV round-trip error statistics are representative."""
    d = dict(vocab_size=512, hidden_size=128, intermediate_size=256,
             num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=2, head_dim=32, rope_theta=10000.0)
    d.update(kw)
    return LlamaConfig(**d)


def _decode_greedy(params, cfg, ids, n_steps, quantized):
    """Prefill `ids` then greedy-decode n_steps with a preallocated cache.
    Returns (tokens [B, n_steps], step_logits [n_steps, B, V])."""
    B, L0 = ids.shape
    cache = KVCache.init(cfg, B, L0 + n_steps, quantized=quantized)
    emb = embed_tokens(params, cfg, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(L0)[None, :], (B, L0))
    logits, cache = llama_forward(params, cfg, emb, pos, kv_cache=cache,
                                  cache_offset=0)
    tok = jnp.argmax(logits[:, -1], axis=-1)
    toks, steps = [tok], []
    for t in range(n_steps - 1):
        emb = embed_tokens(params, cfg, tok[:, None])
        pos = jnp.full((B, 1), L0 + t, jnp.int32)
        logits, cache = llama_forward(params, cfg, emb, pos, kv_cache=cache,
                                      cache_offset=L0 + t)
        steps.append(np.asarray(logits[:, 0], np.float32))
        tok = jnp.argmax(logits[:, -1], axis=-1)
        toks.append(tok)
    return np.stack([np.asarray(t) for t in toks], 1), np.stack(steps), cache


def test_int8_kv_cache_keeps_scales_and_quantized_values():
    cfg = _mid_cfg()
    params = init_llama_params(jax.random.key(0), cfg)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12))
    _, _, cache = _decode_greedy(params, cfg, ids, 4, quantized=True)
    # (a) the returned cache still carries scales (round-2 bug: rebuilt
    # the KVCache without its scale fields at models/llama.py:287)
    assert cache.kv_scale is not None
    # (b) the int8 buffers hold real quantized values, not astype-truncated
    # bf16 (which collapsed to zeros in the round-2 repro)
    k0 = np.asarray(cache.k[0][:, :12])
    assert k0.dtype == np.int8
    assert np.abs(k0).max() > 10, "int8 keys look truncated, not quantized"
    s0 = np.asarray(cache.kv_scale[0][:, :, :12])  # [B, 2*Hkv, S] layout
    assert (s0 > 0).all(), "written cache slots must carry positive scales"


def test_int8_kv_logits_match_bf16_cache():
    cfg = _mid_cfg()
    params = init_llama_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (2, 12))
    n = 10
    tok_bf, logit_bf, _ = _decode_greedy(params, cfg, ids, n, quantized=False)
    tok_q, logit_q, _ = _decode_greedy(params, cfg, ids, n, quantized=True)
    # per-step logits track the bf16-cache computation within ~2% rel
    rel = (np.linalg.norm(logit_q - logit_bf)
           / max(np.linalg.norm(logit_bf), 1e-9))
    assert rel < 0.02, f"kv_quant logits rel err {rel:.4f}"
    # >=95% greedy token agreement
    agree = (tok_bf == tok_q).mean()
    assert agree >= 0.95, f"greedy agreement {agree:.2f}\n{tok_bf}\n{tok_q}"


def test_int8_kv_generate_mostly_agrees_composite():
    """End-to-end composite check (tightened vs the round-2 >=50% bar)."""
    from mtasr_tpu.config import GenerationConfig
    from mtasr_tpu.generate import generate
    from mtasr_tpu.models.speech_encoder_decoder import init_model_params
    from tests.test_composite import make_batch, tiny_cfg
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(0), cfg)
    wav, amask, _ = make_batch(cfg, B=2, seed=9)
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   gen=GenerationConfig(do_sample=False), max_new_tokens=8)
    outq = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                    gen=GenerationConfig(do_sample=False, kv_quant=True),
                    max_new_tokens=8)
    a, b = np.asarray(out.sequences), np.asarray(outq.sequences)
    assert (a == b).mean() >= 0.95, (a, b)


# ---------------------------------------------------------------------------
# scan_layers x LoRA composition
# ---------------------------------------------------------------------------

def _lora_with_random_B(key, dec_params, **kw):
    """init_decoder_lora zeroes lora_B (delta = 0) — randomize it so the
    parity tests actually exercise the LoRA branch."""
    lora = init_decoder_lora(key, dec_params, **kw)
    k = key
    for li, projs in lora.items():
        if li == "__meta__":
            continue
        for proj, ab in projs.items():
            k, sub = jax.random.split(k)
            ab["lora_B"] = 0.05 * jax.random.normal(
                sub, ab["lora_B"].shape, ab["lora_B"].dtype)
    return lora


def test_scan_layers_with_lora_matches_unrolled():
    cfg = _mid_cfg(num_hidden_layers=3)
    params = init_llama_params(jax.random.key(0), cfg)
    lora = _lora_with_random_B(jax.random.key(5), params, r=4)
    ids = np.random.default_rng(2).integers(0, cfg.vocab_size, (2, 9))
    emb = embed_tokens(params, cfg, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(9)[None, :], (2, 9))

    base, _ = llama_forward(params, cfg, emb, pos, lora=lora)
    cfg.scan_layers = True
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the scan path must NOT warn
        scanned, _ = llama_forward(params, cfg, emb, pos, lora=lora)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_scan_layers_with_lora_dropout_matches_unrolled():
    """Same dropout RNG stream in both paths: fold_in(lora_rng, layer_idx)
    then fold_in(., per-projection constant)."""
    cfg = _mid_cfg(num_hidden_layers=3)
    params = init_llama_params(jax.random.key(0), cfg)
    lora = _lora_with_random_B(jax.random.key(5), params, r=4)
    ids = np.random.default_rng(2).integers(0, cfg.vocab_size, (2, 9))
    emb = embed_tokens(params, cfg, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(9)[None, :], (2, 9))
    rng = jax.random.key(77)

    base, _ = llama_forward(params, cfg, emb, pos, lora=lora,
                            lora_rng=rng, lora_dropout=0.3)
    cfg.scan_layers = True
    scanned, _ = llama_forward(params, cfg, emb, pos, lora=lora,
                               lora_rng=rng, lora_dropout=0.3)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_scan_layers_with_lora_grads_match():
    cfg = _mid_cfg(num_hidden_layers=3)
    params = init_llama_params(jax.random.key(0), cfg)
    lora = _lora_with_random_B(jax.random.key(5), params, r=4)
    ids = np.random.default_rng(2).integers(0, cfg.vocab_size, (2, 9))
    pos = jnp.broadcast_to(jnp.arange(9)[None, :], (2, 9))

    def loss(lora, scan):
        cfg.scan_layers = scan
        emb = embed_tokens(params, cfg, jnp.asarray(ids))
        out, _ = llama_forward(params, cfg, emb, pos, lora=lora)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    g0 = jax.grad(loss)(lora, False)
    g1 = jax.grad(loss)(lora, True)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_scan_layers_heterogeneous_lora_warns_and_falls_back():
    cfg = _mid_cfg(num_hidden_layers=3)
    params = init_llama_params(jax.random.key(0), cfg)
    lora = _lora_with_random_B(jax.random.key(5), params, r=4, layers=[0])
    ids = np.random.default_rng(2).integers(0, cfg.vocab_size, (2, 9))
    emb = embed_tokens(params, cfg, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(9)[None, :], (2, 9))
    base, _ = llama_forward(params, cfg, emb, pos, lora=lora)
    cfg.scan_layers = True
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scanned, _ = llama_forward(params, cfg, emb, pos, lora=lora)
    assert any("scan_layers" in str(x.message) for x in w), \
        "heterogeneous-LoRA fallback must warn loudly"
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# LoRA dropout cross-process determinism
# ---------------------------------------------------------------------------

_SUBPROC_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")  # see conftest: env var alone
import numpy as np, jax.numpy as jnp       # does not beat sitecustomize
from mtasr_tpu.config import LlamaConfig
from mtasr_tpu.models.llama import embed_tokens, init_llama_params, llama_forward
from mtasr_tpu.train.lora import init_decoder_lora
cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=2, head_dim=16, rope_theta=10000.0)
params = init_llama_params(jax.random.key(0), cfg)
lora = init_decoder_lora(jax.random.key(5), params, r=4)
for li, projs in lora.items():
    if li == "__meta__": continue
    for proj, ab in projs.items():
        ab["lora_B"] = jnp.ones_like(ab["lora_B"]) * 0.05
ids = np.arange(12).reshape(2, 6) % 64
emb = embed_tokens(params, cfg, jnp.asarray(ids))
pos = jnp.broadcast_to(jnp.arange(6)[None, :], (2, 6))
out, _ = llama_forward(params, cfg, emb, pos, lora=lora,
                       lora_rng=jax.random.key(123), lora_dropout=0.5)
print(repr(float(jnp.sum(out.astype(jnp.float64)))))
"""


def test_lora_dropout_bitwise_deterministic_across_processes():
    """Two fresh interpreters (fresh str-hash salts) must produce the exact
    same dropout stream — pins the fixed per-projection fold table."""
    vals = []
    for i in range(2):
        r = subprocess.run(
            [sys.executable, "-c", _SUBPROC_SCRIPT], capture_output=True,
            text=True, check=True,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONHASHSEED": "random"},
            cwd="/root/repo")
        vals.append(r.stdout.strip().splitlines()[-1])
    assert vals[0] == vals[1], vals


def test_align_mask_len_matches_reference_rule():
    """Pin align_mask_len to the reference's exact rule
    (modeling_speech_encoder_decoder_llama.py:76-84): truncate when longer,
    repeat the last column when shorter (VERDICT r2 weak #8 asked for a
    test pinning the ctc_bridge=raw mask tail to this behavior)."""
    from mtasr_tpu.models.speech_encoder_decoder import align_mask_len

    def ref_rule(mask, t_target):
        # numpy port of the torch reference (pads one repeated last value
        # at a time, like calling the torch fn repeatedly)
        m = mask.copy()
        while m.shape[1] < t_target:
            m = np.concatenate([m, m[:, -1:]], axis=1)
        return m[:, :t_target]

    rng = np.random.default_rng(0)
    for T, T_target in [(10, 10), (10, 9), (10, 11), (10, 13), (6, 3)]:
        mask = rng.integers(0, 2, (3, T)).astype(bool)
        mask[:, -1] = False  # tail is normally padding
        got = np.asarray(align_mask_len(jnp.asarray(mask), T_target))
        np.testing.assert_array_equal(got, ref_rule(mask, T_target), err_msg=f"{T}->{T_target}")


def test_ctc_bridge_raw_mask_uses_align_rule():
    """The raw-bridge encoder_attention_mask must equal
    align_mask_len(tile(enc_mask, K), Ts) — shorter-than-Ts tails extend
    the final (padding) column, longer ones truncate (reference 631-641)."""
    from tests.test_composite import tiny_cfg  # shared tiny geometry helper
    from mtasr_tpu.models.speech_encoder_decoder import (
        align_mask_len, encode_speech, init_model_params,
    )
    from mtasr_tpu.models.wavlm import feature_vector_attention_mask
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True, talker_numbers=2,
                   ctc_bridge=True, ctc_bridge_type="raw")
    params = init_model_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    amask = np.ones((2, 8000), np.int32)
    amask[1, 6000:] = 0
    enc = encode_speech(params, cfg, wav, jnp.asarray(amask))
    Ts = enc.encoder_hidden_states.shape[1]
    # enc_mask as encode_speech builds it: the post-adapter T8 mask, with
    # T8 taken from a no-bridge encode of the same inputs
    cfg_plain = cfg.__class__(**{**cfg.__dict__, "ctc_bridge": False})
    T8 = encode_speech(params, cfg_plain, wav,
                       jnp.asarray(amask)).encoder_hidden_states.shape[1]
    enc_mask = feature_vector_attention_mask(cfg.encoder, T8,
                                             jnp.asarray(amask))
    want = np.asarray(align_mask_len(
        jnp.tile(enc_mask, (1, cfg.talker_numbers)), Ts))
    np.testing.assert_array_equal(np.asarray(enc.encoder_attention_mask),
                                  want)
