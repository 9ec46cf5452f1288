"""scan_layers path: numerically identical to the unrolled loop (no-cache
training path); composite + grads agree."""
import numpy as np

import jax
import jax.numpy as jnp

from mtasr_tpu.models.llama import embed_tokens, init_llama_params, llama_forward
from mtasr_tpu.config import LlamaConfig
from tests.test_composite import make_batch, tiny_cfg
from mtasr_tpu.models.speech_encoder_decoder import init_model_params, model_forward


def test_scan_layers_matches_unrolled():
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=3, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16, rope_theta=10000.0)
    params = {"decoder": init_llama_params(jax.random.key(0), cfg)}
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 9))
    emb = embed_tokens(params["decoder"], cfg, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(9)[None, :], (2, 9))

    base, _ = llama_forward(params["decoder"], cfg, emb, pos)
    cfg.scan_layers = True
    scanned, _ = llama_forward(params["decoder"], cfg, emb, pos)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_scan_layers_composite_grads_match():
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    params = init_model_params(jax.random.key(1), cfg)
    wav, amask, arr = make_batch(cfg, seed=11)

    def loss_fn(p):
        return model_forward(
            p, cfg, jnp.asarray(wav), jnp.asarray(amask),
            jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
            ce_labels=jnp.asarray(arr["ce_labels"]),
            label_spks=jnp.asarray(arr["label_spks"]),
            label_spk_lens=jnp.asarray(arr["label_spk_lens"])).loss

    l0, g0 = jax.value_and_grad(loss_fn)(params)
    cfg.decoder.scan_layers = True
    cfg.decoder.remat = True
    l1, g1 = jax.value_and_grad(loss_fn)(params)
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5)


def test_wavlm_scan_layers_matches_unrolled():
    import sys
    from tests.test_wavlm_parity import _make_pair
    from mtasr_tpu.models.wavlm import wavlm_forward
    hf, cfg, params = _make_pair(True, "layer")
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32)
    base = wavlm_forward(params, cfg, wav)
    cfg.scan_layers = True
    scanned = wavlm_forward(params, cfg, wav)
    np.testing.assert_allclose(np.asarray(scanned.last_hidden_state),
                               np.asarray(base.last_hidden_state),
                               rtol=1e-5, atol=1e-5)
    # grads through the scan path are finite
    def loss(p):
        return jnp.sum(wavlm_forward(p, cfg, wav).last_hidden_state ** 2)
    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
