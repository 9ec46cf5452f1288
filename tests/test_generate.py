"""Generation engine tests: greedy decode consistency vs teacher-forced
logits, eos early-stop, instruct prompt splicing, sampling shapes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.config import GenerationConfig
from mtasr_tpu.generate import generate, generate_ctc
from mtasr_tpu.models.llama import embed_tokens, llama_forward
from mtasr_tpu.models.speech_encoder_decoder import (
    encode_speech, init_model_params,
)
from tests.test_composite import BOS, EOS, PAD, VOCAB, make_batch, tiny_cfg


def _greedy_reference(params, cfg, enc, max_new):
    """Naive greedy decode WITHOUT a KV cache: recompute the full forward for
    every step (the 'obviously correct' baseline)."""
    speech = enc.encoder_hidden_states
    B, Ts = speech.shape[:2]
    ids = np.full((B, 1), cfg.decoder_start_token_id, np.int32)
    out = []
    for _ in range(max_new):
        emb = embed_tokens(params["decoder"], cfg.decoder, jnp.asarray(ids),
                           dtype=speech.dtype)
        full = jnp.concatenate([emb[:, :1], speech, emb[:, 1:]], axis=1)
        L = full.shape[1]
        pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        kv = jnp.concatenate([jnp.ones((B, 1), bool), enc.encoder_attention_mask,
                              jnp.ones((B, ids.shape[1] - 1), bool)], axis=1)
        logits, _ = llama_forward(params["decoder"], cfg.decoder, full, pos,
                                  key_valid_mask=kv)
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1)).astype(np.int32)
        out.append(nxt)
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
    return np.stack(out, axis=1)  # [B, max_new]


def test_greedy_generate_matches_uncached_reference():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(7), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=5)
    enc = encode_speech(params, cfg, jnp.asarray(wav), jnp.asarray(amask))

    max_new = 6
    ref = _greedy_reference(params, cfg, enc, max_new)
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   max_new_tokens=max_new)
    seqs = np.asarray(out.sequences)
    # compare until each row's first EOS (after that ours emits PAD)
    for b in range(2):
        for t in range(max_new):
            assert seqs[b, t] == ref[b, t]
            if ref[b, t] == EOS:
                break


def test_generate_eos_early_stop_and_padding():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(3), cfg)
    wav, amask, _ = make_batch(cfg, B=3, S=8000, seed=8)
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   max_new_tokens=20)
    seqs, lens = np.asarray(out.sequences), np.asarray(out.lengths)
    for b in range(3):
        row = seqs[b]
        if EOS in row:
            e = list(row).index(EOS)
            assert np.all(row[e + 1:] == PAD)
            assert lens[b] == e + 1
        else:
            assert lens[b] == 20


def test_generate_instruct_prompt():
    cfg = tiny_cfg(train_mode="attention", instruct=True,
                   bosp_token_id=52, eosp_token_id=53, boss_token_id=54,
                   eoss_token_id=55, bosr_token_id=56, eosr_token_id=57)
    params = init_model_params(jax.random.key(4), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=9)
    # prompt_ids (no BOS): [bosp, p, p, eosp, boss, eoss, bosr]
    prompt = np.tile(np.array([[52, 30, 31, 53, 54, 55, 56]], np.int32), (2, 1))
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   prompt_ids=jnp.asarray(prompt), max_new_tokens=5)
    assert np.asarray(out.sequences).shape == (2, 5)

    with pytest.raises(ValueError):
        generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                 max_new_tokens=5)


def test_generate_sampling_runs():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(5), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=10)
    g = GenerationConfig(do_sample=True, temperature=0.8, top_k=10, top_p=0.95)
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask), gen=g,
                   rng=jax.random.key(0), max_new_tokens=8)
    seqs = np.asarray(out.sequences)
    assert seqs.shape == (2, 8)
    assert seqs.max() < VOCAB


def test_generate_ctc_end_to_end():
    cfg = tiny_cfg(train_mode="ctc", talker_ctc=True)
    params = init_model_params(jax.random.key(6), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=11)
    trans, lens = generate_ctc(params, cfg, jnp.asarray(wav),
                               jnp.asarray(amask), max_out_len=12)
    assert np.asarray(trans).shape == (2, 24)


def test_generate_rejects_heterogeneous_prompts():
    """A batch mixing prompt layouts (padded shorter prompt) must fail
    loudly instead of silently mis-splicing the shorter rows (VERDICT r2
    missing #2; the reference decodes per-sample so this never arises
    there, inference_asr.py:171-217)."""
    cfg = tiny_cfg(train_mode="attention", instruct=True,
                   bosp_token_id=52, eosp_token_id=53, boss_token_id=54,
                   eoss_token_id=55, bosr_token_id=56, eosr_token_id=57)
    params = init_model_params(jax.random.key(4), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=9)
    # row 0: 2-token prompt; row 1: 1-token prompt padded at the tail
    prompt = np.asarray([[52, 30, 31, 53, 54, 55, 56],
                         [52, 30, 53, 54, 55, 56, 0]], np.int32)
    with pytest.raises(ValueError, match="heterogeneous"):
        generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                 prompt_ids=jnp.asarray(prompt), max_new_tokens=5)


def test_batches_group_by_prompt_length():
    """The pipeline buckets by (audio bucket, prompt length) so instruct
    batches never mix prompt layouts."""
    from mtasr_tpu.config import DataConfig, SpeechEncoderDecoderConfig
    from mtasr_tpu.data.pipeline import PreparedExample, batches_from_examples
    cfg = tiny_cfg(train_mode="attention", instruct=True,
                   bosp_token_id=52, eosp_token_id=53, boss_token_id=54,
                   eoss_token_id=55, bosr_token_id=56, eosr_token_id=57)
    dc = DataConfig(max_label_length=16)
    n = 4000  # same audio bucket for all
    exs = []
    for i in range(8):
        # two prompt layouts: 5 tokens vs 6 tokens
        p = ([52, 30, 53, 54, 55, 56] if i % 2 else [52, 53, 54, 55, 56])
        wav = np.zeros(n, np.float32)
        # instruct labels = prompt_str + response tokens (prepare_example)
        exs.append(PreparedExample(f"u{i}", wav, p + [40, 41], p, n))
    got = list(batches_from_examples(exs, cfg, dc, batch_size=2,
                                     training=False, shuffle=False,
                                     drop_last=False))
    assert len(got) == 4
    for b in got:
        pl = b.arrays["prompt_ids"]
        # every row in a batch shares one prompt layout (no pad mixing)
        assert (pl == pl[0]).all(), pl


def test_generate_batch_invariance():
    """Each row's decode must be independent of the batch it rides in
    (guards the serving bench's large-batch default: a row decoded in a
    B=4 batch must match the same row decoded in a B=2 batch). Covers
    flash/XLA attention batching, KV-cache slotting, and eos masking."""
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(3), cfg)
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=11)
    # B=4 batch = the same two rows duplicated (row i == row i+2)
    wav4 = np.concatenate([wav, wav], axis=0)
    amask4 = np.concatenate([amask, amask], axis=0)
    gen = GenerationConfig(do_sample=False)
    out2 = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                    gen=gen, max_new_tokens=8)
    out4 = generate(params, cfg, jnp.asarray(wav4), jnp.asarray(amask4),
                    gen=gen, max_new_tokens=8)
    s2, s4 = np.asarray(out2.sequences), np.asarray(out4.sequences)
    np.testing.assert_array_equal(s2, s4[:2])
    np.testing.assert_array_equal(s2, s4[2:])


def test_generate_encode_chunk_matches_unchunked():
    """gen.encode_chunk bounds the encoder's peak HBM by encoding the batch
    in chunks while decoding at full B — output must be identical to the
    single-pass encode (serving uses this to push the decode batch past
    what the conv frontend's intermediates allow in one pass)."""
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(5), cfg)
    wav, amask, _ = make_batch(cfg, B=4, S=8000, seed=13)
    base = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                    gen=GenerationConfig(do_sample=False), max_new_tokens=6)
    # chunk=3 exercises the ragged tail (chunks of 3 and 1)
    for chunk in (2, 3):
        out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                       gen=GenerationConfig(do_sample=False,
                                            encode_chunk=chunk),
                       max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(base.sequences),
                                      np.asarray(out.sequences))
