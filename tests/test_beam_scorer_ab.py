"""Exact A/B of the pure beam bookkeeping vs the installed HF
BeamSearchScorer on IDENTICAL synthetic logprobs.

The model-level beam A/Bs (test_reference_ab.py) pin integration but run
two neural nets in two frameworks, so scores carry ~1e-2 cross-framework
drift and knife-edge is_done comparisons can flip either way. Here both
sides consume the SAME float32 logprob tables (a Markov "model": the
step-t distribution depends only on each beam's last token), so every
comparison — first-step rank<W eos admission, generated_len-INCLUDING-eos
normalization (BeamSearchScorer.process: cur_len = input_ids.shape[-1]+1),
the 2W rank filter, the early_stopping=False is_done heuristic, and the
finalize alive-merge skip for done batches — must agree exactly.

Reference anchor: the reference vendors this machinery wholesale
(/root/reference/utils/generation_utils.py:3379 beam_search); our
beam_state_* functions re-derive its semantics batched (beam.py docstring).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mtasr_tpu.generate.beam import (
    beam_state_finalize, beam_state_init, beam_state_step,
)

torch = pytest.importorskip("torch")

PAD, EOS, BOS = 0, 2, 1


def _tables(B, V, T, seed, eos_bias=0.0, eos_ramp=0.0, first_eos_batch=None):
    """logp0 [B,V] for the first step; table [T,B,V,V] mapping each beam's
    last token -> next-step logprobs. Raw scores (no softmax) — both sides
    consume them verbatim, so normalization is irrelevant to the A/B."""
    rng = np.random.default_rng(seed)
    logp0 = rng.normal(-3.0, 1.0, (B, V)).astype(np.float32)
    logp0[:, EOS] -= 2.0
    if first_eos_batch is not None:
        logp0[first_eos_batch, EOS] = 0.0  # top candidate: rank-0 eos
    table = rng.normal(-3.0, 1.0, (T, B, V, V)).astype(np.float32)
    for t in range(T):
        table[t, :, :, EOS] += eos_bias + eos_ramp * t
    return logp0, table


def _run_ours(logp0, table, W, T, lp):
    B, V = logp0.shape
    state = beam_state_init(jnp.asarray(logp0), W, EOS, PAD, T)
    t = 1
    while t < T and not bool(jnp.all(state[5])):
        last = np.asarray(state[0][:, :, t - 1])              # [B, W]
        logp = np.stack([table[t, b, last[b]] for b in range(B)])  # [B,W,V]
        state, _ = beam_state_step(t, jnp.asarray(logp), state, W, EOS, lp)
        t += 1
    out = beam_state_finalize(state, W, T, lp)
    return (np.asarray(out.sequences), np.asarray(out.scores),
            np.asarray(out.lengths))


def _run_hf(logp0, table, W, T, lp):
    """A faithful mini _beam_search driving the installed scorer with the
    same tables (candidate generation exactly as generation_utils.py:3379:
    joint scores -> topk 2W -> scorer.process -> reorder -> append)."""
    from transformers.generation.beam_search import BeamSearchScorer
    B, V = logp0.shape
    scorer = BeamSearchScorer(batch_size=B, num_beams=W,
                              device=torch.device("cpu"),
                              length_penalty=lp, do_early_stopping=False,
                              num_beam_hyps_to_keep=W)
    input_ids = torch.full((B * W, 1), BOS, dtype=torch.long)
    beam_scores = torch.full((B, W), -1e9)
    beam_scores[:, 0] = 0.0
    beam_scores = beam_scores.view(-1)
    for t in range(T):
        if t == 0:
            logp = torch.tensor(logp0).repeat_interleave(W, 0)   # [B*W, V]
        else:
            last = input_ids[:, -1].numpy()
            logp = torch.tensor(
                np.stack([table[t, i // W, last[i]]
                          for i in range(B * W)]))
        next_scores = logp + beam_scores[:, None]
        next_scores = next_scores.view(B, W * V)
        top_scores, top_idx = torch.topk(next_scores, 2 * W, dim=1)
        next_idx = top_idx // V
        next_tok = top_idx % V
        out = scorer.process(input_ids, top_scores, next_tok, next_idx,
                             pad_token_id=PAD, eos_token_id=EOS,
                             decoder_prompt_len=1)
        beam_scores = out["next_beam_scores"]
        input_ids = torch.cat(
            [input_ids[out["next_beam_indices"], :],
             out["next_beam_tokens"].unsqueeze(-1)], dim=-1)
        if scorer.is_done:
            break
    fin = scorer.finalize(input_ids, beam_scores, None, None,
                          max_length=1 + T, pad_token_id=PAD,
                          eos_token_id=EOS, decoder_prompt_len=1)
    seqs = fin["sequences"][:, 1:].numpy()            # strip the bos prompt
    scores = fin["sequence_scores"].numpy()
    return seqs.reshape(B, W, -1), scores.reshape(B, W)


def _trim(row):
    toks = [int(x) for x in row if int(x) != PAD]
    if EOS in toks:
        toks = toks[: toks.index(EOS) + 1]
    return toks


def _assert_match(logp0, table, W, T, lp):
    my_seq, my_scores, _ = _run_ours(logp0, table, W, T, lp)
    hf_seq, hf_scores = _run_hf(logp0, table, W, T, lp)
    B = logp0.shape[0]
    for b in range(B):
        for w in range(W):
            assert _trim(my_seq[b, w]) == _trim(hf_seq[b, w]), (
                b, w, _trim(my_seq[b, w]), _trim(hf_seq[b, w]))
            # ours sums in f32, HF in f64 off .item() floats
            assert abs(float(my_scores[b, w]) - float(hf_scores[b, w])) \
                < 1e-4, (b, w, my_scores[b, w], hf_scores[b, w])
    return my_seq, my_scores


@pytest.mark.parametrize("lp", [0.0, 1.0, 2.0])
def test_differing_finish_lengths(lp):
    """EOS ramp makes hypotheses finish mid-loop at differing lengths, so
    the top-W ranking depends on the generated_len normalization — the
    (t+1)-includes-eos pin (advisor round-4 high)."""
    W, T = 4, 12
    logp0, table = _tables(B=3, V=11, T=T, seed=0, eos_bias=-1.0,
                           eos_ramp=0.45)
    my_seq, _ = _assert_match(logp0, table, W, T, lp)
    lens = {len(_trim(my_seq[b, w])) for b in range(3) for w in range(W)}
    assert len(lens) > 1 and min(lens) < T, lens   # the regime holds


def test_first_step_eos_admitted():
    """A rank-0 eos at the very first step is admitted as the empty
    hypothesis with generated_len 1 (advisor round-4 medium)."""
    W, T = 4, 8
    logp0, table = _tables(B=2, V=9, T=T, seed=1, first_eos_batch=0)
    my_seq, my_scores = _assert_match(logp0, table, W, T, 1.0)
    # batch 0 must carry the [eos] hypothesis with score logp(eos)/1
    rows = [_trim(my_seq[0, w]) for w in range(W)]
    assert [EOS] in rows, rows
    w = rows.index([EOS])
    assert abs(float(my_scores[0, w]) - float(logp0[0, EOS])) < 1e-5


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_is_done_early_exit(seed):
    """Strong eos pressure fills pools early; the is_done heuristic must
    freeze batches and exit exactly when HF does (advisor round-4 low +
    VERDICT r4 #8 early exit)."""
    W, T = 2, 10
    logp0, table = _tables(B=2, V=8, T=T, seed=seed, eos_bias=1.5)
    _assert_match(logp0, table, W, T, 1.0)


@pytest.mark.parametrize("seed,lp", [(7, 1.0), (8, 0.5), (9, 1.5)])
def test_random_regimes(seed, lp):
    W, T = 3, 9
    logp0, table = _tables(B=2, V=13, T=T, seed=seed, eos_bias=0.3,
                           eos_ramp=0.2)
    _assert_match(logp0, table, W, T, lp)
