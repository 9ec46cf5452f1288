"""Speculative decoding: output must be TOKEN-IDENTICAL to plain greedy
decode at every acceptance rate (greedy speculative verification is exact),
with the step count — not the output — depending on draft quality.

Covers: CTC-head drafts (random weights: near-zero acceptance), oracle
drafts (full acceptance, ~(k+1)x fewer steps), adversarial drafts,
heterogeneous per-row draft quality (burns cache slots via masked holes and
forces the exact 1-token fallback), instruct mode, and the draft builder's
SOT assembly. No reference counterpart (the reference decodes one token at
a time, utils/generation_utils.py:3166) — beyond-parity feature."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.config import GenerationConfig
from mtasr_tpu.generate import generate, generate_speculative
from mtasr_tpu.generate.speculative import ctc_sot_draft
from mtasr_tpu.models.speech_encoder_decoder import (
    encode_speech, init_model_params,
)
from tests.test_composite import EOS, PAD, SC, make_batch, tiny_cfg


def _setup(seed=3, **cfg_kw):
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True, **cfg_kw)
    params = init_model_params(jax.random.key(seed), cfg)
    wav, amask, _ = make_batch(cfg, seed=5)
    return cfg, params, jnp.asarray(wav), jnp.asarray(amask)


def _plain(params, cfg, wav, amask, mn, prompt=None):
    return np.asarray(generate(
        params, cfg, wav, amask, prompt_ids=prompt,
        gen=GenerationConfig(do_sample=False), max_new_tokens=mn).sequences)


def test_spec_ctc_draft_matches_plain_greedy():
    cfg, params, wav, amask = _setup()
    ref = _plain(params, cfg, wav, amask, 12)
    out, st = generate_speculative(
        params, cfg, wav, amask,
        gen=GenerationConfig(do_sample=False, speculative="ctc", spec_k=3),
        max_new_tokens=12)
    np.testing.assert_array_equal(np.asarray(out.sequences), ref)
    assert int(st.spec_steps) >= 1
    assert np.all(np.asarray(st.emitted) == np.sum(ref != PAD, axis=1))


def test_spec_oracle_draft_full_acceptance():
    """Draft == the model's own greedy output: every draft accepted, so
    12 tokens take ceil((12-1)/(k+1)) = 3 verify steps, not 11."""
    cfg, params, wav, amask = _setup()
    ref = _plain(params, cfg, wav, amask, 12)
    out, st = generate_speculative(
        params, cfg, wav, amask,
        gen=GenerationConfig(do_sample=False, speculative="ctc", spec_k=3),
        max_new_tokens=12, draft_tokens=jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out.sequences), ref)
    assert int(st.spec_steps) == 3
    assert int(st.accepted_drafts) > 0
    assert int(st.fallback_steps) == 0


def test_spec_adversarial_draft_exact():
    cfg, params, wav, amask = _setup()
    ref = _plain(params, cfg, wav, amask, 12)
    bad = jnp.full((wav.shape[0], 12), PAD, jnp.int32)
    out, st = generate_speculative(
        params, cfg, wav, amask,
        gen=GenerationConfig(do_sample=False, speculative="ctc", spec_k=3),
        max_new_tokens=12, draft_tokens=bad)
    np.testing.assert_array_equal(np.asarray(out.sequences), ref)
    assert int(st.accepted_drafts) == 0


def test_spec_heterogeneous_rows_force_fallback():
    """Row 0 gets oracle drafts (accepts k+1 slots/step), row 1 garbage
    (1 token/step): slot use outpaces the slowest row's progress, the spec
    loop's budget guard trips, and the exact 1-token fallback finishes —
    output still token-identical."""
    cfg, params, wav, amask = _setup()
    mn = 12
    ref = _plain(params, cfg, wav, amask, mn)
    draft = np.full((wav.shape[0], mn), PAD, np.int64)
    draft[0] = ref[0]
    out, st = generate_speculative(
        params, cfg, wav, amask,
        gen=GenerationConfig(do_sample=False, speculative="ctc", spec_k=3,
                             spec_cache_factor=1.0),
        max_new_tokens=mn, draft_tokens=jnp.asarray(draft))
    np.testing.assert_array_equal(np.asarray(out.sequences), ref)
    assert int(st.fallback_steps) > 0


def test_spec_instruct_mode():
    cfg, params, wav, amask = _setup(
        seed=4, instruct=True, bosp_token_id=52, eosp_token_id=53,
        boss_token_id=54, eoss_token_id=55, bosr_token_id=56,
        eosr_token_id=57)
    prompt = jnp.asarray(
        np.tile(np.array([[52, 30, 31, 53, 54, 55, 56]], np.int32), (2, 1)))
    ref = _plain(params, cfg, wav, amask, 10, prompt=prompt)
    out, st = generate_speculative(
        params, cfg, wav, amask, prompt_ids=prompt,
        gen=GenerationConfig(do_sample=False, speculative="ctc", spec_k=4),
        max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(out.sequences), ref)


def test_spec_via_generate_dispatch():
    """generate(gen=GenerationConfig(speculative='ctc')) routes through the
    speculative engine and returns the same GenerateOutput contract."""
    cfg, params, wav, amask = _setup()
    ref = _plain(params, cfg, wav, amask, 8)
    out = generate(params, cfg, wav, amask,
                   gen=GenerationConfig(do_sample=False, speculative="ctc"),
                   max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(out.sequences), ref)
    assert np.array_equal(np.asarray(out.lengths),
                          np.sum(ref != PAD, axis=1))


def test_spec_rejects_sampling():
    cfg, params, wav, amask = _setup()
    with pytest.raises(ValueError, match="greedy-only"):
        generate_speculative(
            params, cfg, wav, amask,
            gen=GenerationConfig(do_sample=True, speculative="ctc"),
            max_new_tokens=4)


def test_ctc_sot_draft_layout():
    """The draft builder assembles spk0 <sc> spk1 <eos> pad... exactly from
    the per-speaker CTC collapses (reconstructed here in numpy)."""
    from mtasr_tpu.models.ctc_head import ctc_argmax
    from mtasr_tpu.models.speech_encoder_decoder import _ctc_head_list
    from mtasr_tpu.ops.ctc import ctc_greedy_collapse
    cfg, params, wav, amask = _setup()
    enc = encode_speech(params, cfg, wav, amask)
    K, mol = cfg.talker_numbers, 6
    draft = np.asarray(ctc_sot_draft(params, cfg, enc, max_out_len=mol))
    B = wav.shape[0]
    assert draft.shape == (B, mol * K + K)
    heads = _ctc_head_list(params, cfg)
    cols, lens = [], []
    for i in range(K):
        path = ctc_argmax(heads[i], enc.sep_hidden[i])
        col, ln = ctc_greedy_collapse(path, enc.mask_x0, cfg.ctc_blank_id,
                                      PAD, mol)
        cols.append(np.asarray(col))
        lens.append(np.asarray(ln))
    for b in range(B):
        want = []
        for i in range(K):
            want += list(cols[i][b][:lens[i][b]])
            want.append(SC if i < K - 1 else EOS)
        want += [PAD] * (draft.shape[1] - len(want))
        np.testing.assert_array_equal(draft[b], np.asarray(want))
