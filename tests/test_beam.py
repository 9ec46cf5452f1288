"""Beam search tests: W=1 equals greedy; beams are distinct, sorted, and
score-consistent; instruct path works."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.generate import generate
from mtasr_tpu.generate.beam import beam_generate
from mtasr_tpu.models.speech_encoder_decoder import init_model_params
from tests.test_composite import EOS, PAD, make_batch, tiny_cfg


def test_beam1_matches_greedy():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(11), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=20)
    greedy = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                      max_new_tokens=6)
    beam = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                         num_beams=1, max_new_tokens=6)
    g = np.asarray(greedy.sequences)
    b = np.asarray(beam.sequences)[:, 0]
    for row_g, row_b in zip(g, b):
        for t in range(6):
            assert row_g[t] == row_b[t]
            if row_g[t] == EOS:
                break


def test_beam_search_properties():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(12), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=21)
    out = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                        num_beams=4, max_new_tokens=6)
    scores = np.asarray(out.scores)
    seqs = np.asarray(out.sequences)
    assert seqs.shape == (2, 4, 6)
    # scores sorted descending per batch
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    # top beams distinct
    for b in range(2):
        assert not np.array_equal(seqs[b, 0], seqs[b, 1])
    # beam-4 top-1 should score >= greedy continuation under the same model
    g1 = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                       num_beams=1, max_new_tokens=6)
    assert np.all(scores[:, 0] >= np.asarray(g1.scores)[:, 0] - 1e-4)


def test_beam_instruct():
    cfg = tiny_cfg(train_mode="attention", instruct=True,
                   bosp_token_id=52, eosp_token_id=53, boss_token_id=54,
                   eoss_token_id=55, bosr_token_id=56, eosr_token_id=57)
    params = init_model_params(jax.random.key(13), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=22)
    prompt = np.tile(np.array([[52, 30, 31, 53, 54, 55, 56]], np.int32),
                     (2, 1))
    out = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                        prompt_ids=jnp.asarray(prompt), num_beams=2,
                        max_new_tokens=4)
    assert np.asarray(out.sequences).shape == (2, 2, 4)


def test_beam_mesh_matches_single_device():
    """Beam decode with dp x tp sharded params/batch (the inference_asr
    --dp_size/--tp_size route) must be token-identical to single-device
    beam — the cache beam-gather and alive/finished bookkeeping survive
    SPMD partitioning."""
    import jax
    from mtasr_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    if jax.device_count() < 8:
        import pytest
        pytest.skip("needs the 8-device virtual mesh")
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(31), cfg)
    wav, amask, _ = make_batch(cfg, B=4, S=8000, seed=33)
    ref = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                        num_beams=4, max_new_tokens=6)
    mesh = make_mesh(dp_size=4, tp_size=2)
    params_sh = shard_params(params, mesh)
    sb = shard_batch({"w": jnp.asarray(wav), "m": jnp.asarray(amask)}, mesh)
    out = beam_generate(params_sh, cfg, sb["w"], sb["m"],
                        num_beams=4, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out.sequences),
                                  np.asarray(ref.sequences))
    np.testing.assert_allclose(np.asarray(out.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)


def test_beam_kv_quant():
    """kv_quant under beams: W=1 int8-KV beam must equal int8-KV greedy
    token-for-token (identical quantization math, same cache path), and
    W=4 runs with the quantized cache gathered by beam parent."""
    from mtasr_tpu.config import GenerationConfig
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(41), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=42)
    g = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                 gen=GenerationConfig(do_sample=False, kv_quant=True),
                 max_new_tokens=6)
    b1 = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                       num_beams=1, max_new_tokens=6, kv_quant=True)
    gs = np.asarray(g.sequences)
    bs = np.asarray(b1.sequences)[:, 0]
    for row_g, row_b in zip(gs, bs):
        for t in range(6):
            assert row_g[t] == row_b[t]
            if row_g[t] == EOS:
                break
    b4 = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                       num_beams=4, max_new_tokens=6, kv_quant=True)
    assert np.asarray(b4.sequences).shape == (2, 4, 6)
    scores = np.asarray(b4.scores)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)   # sorted best-first


def test_beam_encode_chunk_invariant():
    """encode_chunk under beams: chunked encode must be decode-invariant
    (the encoder has no cross-row coupling), so beams/scores match the
    unchunked run exactly."""
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(51), cfg)
    wav, amask, _ = make_batch(cfg, B=4, S=8000, seed=52)
    full = beam_generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                         num_beams=3, max_new_tokens=5)
    chunked = beam_generate(params, cfg, jnp.asarray(wav),
                            jnp.asarray(amask), num_beams=3,
                            max_new_tokens=5, encode_chunk=2)
    np.testing.assert_array_equal(np.asarray(full.sequences),
                                  np.asarray(chunked.sequences))
    np.testing.assert_allclose(np.asarray(full.scores),
                               np.asarray(chunked.scores), rtol=1e-6,
                               atol=1e-6)
