"""Numerical parity: our JAX LLaMA decoder vs installed HF torch LLaMA with
identical random weights; KV-cache decode consistency vs full forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.config import LlamaConfig
from mtasr_tpu.models.llama import (
    KVCache, embed_tokens, init_llama_params, llama_forward,
)
from mtasr_tpu.utils.torch_interop import convert_torch_state_dict

torch = pytest.importorskip("torch")
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM as HFLlama  # noqa: E402


def _make_pair(tie=False, rope_scaling=None, seed=0):
    kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=tie, rope_scaling=rope_scaling,
        attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(seed)
    hf = HFLlama(HFLlamaConfig(attn_implementation="eager", **kw)).eval()
    cfg = LlamaConfig(**kw)
    params = convert_torch_state_dict(hf.state_dict())
    return hf, cfg, params


@pytest.mark.parametrize("tie,scaling", [
    (False, None),
    (True, {"rope_type": "llama3", "factor": 8.0, "high_freq_factor": 4.0,
            "low_freq_factor": 1.0, "original_max_position_embeddings": 64}),
])
def test_llama_logits_parity(tie, scaling):
    hf, cfg, params = _make_pair(tie, scaling)
    rng = np.random.default_rng(0)
    B, L = 2, 11
    ids = rng.integers(0, cfg.vocab_size, (B, L))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    emb = embed_tokens(params, cfg, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
    logits, _ = llama_forward(params, cfg, emb, pos)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_llama_padding_mask_parity():
    hf, cfg, params = _make_pair()
    rng = np.random.default_rng(1)
    B, L = 2, 9
    ids = rng.integers(0, cfg.vocab_size, (B, L))
    am = np.ones((B, L), np.int64)
    am[1, 6:] = 0  # right padding
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(am)).logits.numpy()
    emb = embed_tokens(params, cfg, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
    logits, _ = llama_forward(params, cfg, emb, pos,
                              key_valid_mask=jnp.asarray(am, bool))
    # compare only valid positions (HF computes garbage on pads too)
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits)[1, :6], ref[1, :6],
                               rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    _, cfg, params = _make_pair(seed=3)
    params = jax.tree_util.tree_map(lambda a: a, params)
    rng = np.random.default_rng(2)
    B, L_prefill, n_steps = 2, 7, 5
    S_max = 16
    ids = rng.integers(0, cfg.vocab_size, (B, L_prefill + n_steps))

    # full forward, no cache
    emb_full = embed_tokens(params, cfg, jnp.asarray(ids))
    pos_full = jnp.broadcast_to(jnp.arange(ids.shape[1])[None, :], ids.shape)
    logits_full, _ = llama_forward(params, cfg, emb_full, pos_full)

    # prefill + stepwise decode with fp32 cache
    cache = KVCache.init(cfg, B, S_max, dtype=jnp.float32)
    emb_p = embed_tokens(params, cfg, jnp.asarray(ids[:, :L_prefill]))
    pos_p = jnp.broadcast_to(jnp.arange(L_prefill)[None, :], (B, L_prefill))
    logits_p, cache = llama_forward(params, cfg, emb_p, pos_p,
                                    kv_cache=cache, cache_offset=0)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits_full)[:, :L_prefill],
                               rtol=2e-4, atol=2e-4)
    for t in range(n_steps):
        idx = L_prefill + t
        emb_t = embed_tokens(params, cfg, jnp.asarray(ids[:, idx:idx + 1]))
        pos_t = jnp.full((B, 1), idx)
        logits_t, cache = llama_forward(params, cfg, emb_t, pos_t,
                                        kv_cache=cache, cache_offset=idx)
        np.testing.assert_allclose(np.asarray(logits_t)[:, 0],
                                   np.asarray(logits_full)[:, idx],
                                   rtol=3e-4, atol=3e-4)


def test_layer_callback_hook():
    """Adapter injection point: after self-attn residual, before MLP
    (reference llama_modules.py:387-400)."""
    _, cfg, params = _make_pair(seed=4)
    ids = np.arange(6)[None, :]
    emb = embed_tokens(params, cfg, jnp.asarray(ids))
    pos = jnp.arange(6)[None, :]
    calls = []

    def cb(idx, h):
        calls.append(idx)
        return h * 1.0

    base, _ = llama_forward(params, cfg, emb, pos)
    hooked, _ = llama_forward(params, cfg, emb, pos, layer_callback=cb)
    assert calls == list(range(cfg.num_hidden_layers))
    np.testing.assert_allclose(np.asarray(base), np.asarray(hooked), rtol=1e-6)

    zeroed, _ = llama_forward(params, cfg, emb, pos,
                              layer_callback=lambda i, h: h * 0.0)
    assert not np.allclose(np.asarray(base), np.asarray(zeroed))
