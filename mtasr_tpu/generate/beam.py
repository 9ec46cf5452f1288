"""Batched KV-cached beam search.

The reference vendors HF's full beam machinery (utils/generation_utils.py:
3379 beam_search) though every run script decodes greedily; this provides
the `num_beams > 1` path TPU-natively: beams folded into the batch dim
(B*W rows), cache rows gathered by beam parent each step, alive/finished
bookkeeping in the standard t5x style, all inside one lax.fori_loop.

Scores follow HF semantics exactly (A/B'd against the reference's vendored
`_beam_search` + installed `BeamSearchScorer` in tests/test_reference_ab.py):
- step candidates are the top-2W of the W*V joint scores, in rank order;
- an EOS candidate enters the finished pool ONLY if its rank < W
  (`beam_token_rank >= group_size -> continue` in BeamSearchScorer.process);
- finished hypotheses are normalized by the GENERATED length EXCLUDING the
  eos token (`generated_len = cur_len - decoder_prompt_len`), while the
  stored sequence keeps the eos (finalize re-appends it);
- the first step draws candidates from beam 0 only (HF inits beam_scores
  to [0, -inf, ...]); an eos at the very first position normalizes by 0
  giving -inf for length_penalty > 0 — i.e. it never survives;
- still-alive beams join the pool at the end normalized by the full
  generated length.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from mtasr_tpu.config import SpeechEncoderDecoderConfig
from mtasr_tpu.models.llama import KVCache, embed_tokens, llama_forward
from mtasr_tpu.models.speech_encoder_decoder import (
    EncodedSpeech, _adapter_callback, encode_speech,
)

NEG_INF = -1.0e7


@dataclass
class BeamOutput:
    sequences: jax.Array   # [B, W, max_new] best-first
    scores: jax.Array      # [B, W] length-normalized
    lengths: jax.Array     # [B, W]


jax.tree_util.register_dataclass(BeamOutput,
                                 data_fields=["sequences", "scores",
                                              "lengths"],
                                 meta_fields=[])


def _expand_beams(tree, W):
    return jax.tree_util.tree_map(
        lambda a: jnp.repeat(a, W, axis=0), tree)


def _gather_beams(tree, parent_global):
    return jax.tree_util.tree_map(
        lambda a: jnp.take(a, parent_global, axis=0), tree)


@partial(jax.jit, static_argnames=("cfg", "num_beams", "max_new_tokens",
                                   "splice_index"))
def _beam_impl(params, cfg: SpeechEncoderDecoderConfig, enc: EncodedSpeech,
               prefill_ids: jax.Array, splice_index: int, num_beams: int,
               max_new_tokens: int, length_penalty: float) -> BeamOutput:
    dec_cfg = cfg.decoder
    W = num_beams
    speech = enc.encoder_hidden_states
    B, Ts = speech.shape[:2]
    Lp = prefill_ids.shape[1]
    total_prefill = Lp + Ts
    S_max = total_prefill + max_new_tokens
    eos_id = cfg.eos_token_id
    pad_id = cfg.pad_token_id
    V = dec_cfg.vocab_size

    # ---- prefill on B rows (shared with the greedy engine: per-row
    # position compaction + per-row last-valid-frame logits for padded
    # audio — see engine._prefill) ----
    from mtasr_tpu.generate.engine import _prefill
    cache, last_logits, n_valid, _ = _prefill(
        params, cfg, enc, prefill_ids, splice_index, S_max, False)

    # ---- init beams: HF draws the first top-2W from beam 0 only, fills
    # the W alive slots with non-eos candidates in rank order; an eos here
    # would be an empty hypothesis normalized by 0 -> -inf, so it never
    # enters the finished pool ----
    logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), -1)  # [B,V]
    top0_scores, top0_toks = jax.lax.top_k(logp0, 2 * W)               # [B,2W]
    alive_cand0 = jnp.where(top0_toks == eos_id, NEG_INF, top0_scores)
    init_scores, idx0 = jax.lax.top_k(alive_cand0, W)                  # [B,W]
    init_toks = jnp.take_along_axis(top0_toks, idx0, 1)
    cache = _expand_beams(cache, W)            # rows b*W + w
    # adapter memory is captured in the callback closure over enc (B rows);
    # expand it too so per-step decode sees B*W rows
    enc_bw = _expand_beams(enc, W)
    cb_bw = _adapter_callback(params, cfg, enc_bw)
    n_valid_bw = jnp.repeat(n_valid, W, axis=0)      # [B*W]

    alive_seq = jnp.full((B, W, max_new_tokens), pad_id, jnp.int32)
    alive_seq = alive_seq.at[:, :, 0].set(init_toks)
    alive_scores = init_scores
    fin_seq = jnp.full((B, W, max_new_tokens), pad_id, jnp.int32)
    fin_scores = jnp.full((B, W), NEG_INF)
    fin_lens = jnp.zeros((B, W), jnp.int32)

    def body(t, state):
        alive_seq, alive_scores, fin_seq, fin_scores, fin_lens, cache = state
        cur = alive_seq[:, :, t - 1].reshape(B * W)
        emb_t = embed_tokens(params["decoder"], dec_cfg, cur[:, None],
                             dtype=speech.dtype)
        # per-row true position: speech padding does not advance positions
        # (engine._generate_impl body uses the same arithmetic)
        pos_t = (Lp + n_valid_bw)[:, None] - 1 + t
        logits_t, cache = llama_forward(
            params["decoder"], dec_cfg, emb_t, pos_t,
            kv_cache=cache, cache_offset=total_prefill + t - 1,
            layer_callback=cb_bw, logits_to_keep=1)
        logp = jax.nn.log_softmax(
            logits_t[:, -1].astype(jnp.float32), -1).reshape(B, W, V)
        cand = alive_scores[:, :, None] + logp                 # [B, W, V]
        flat = cand.reshape(B, W * V)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * W)       # [B, 2W]
        parent = top_idx // V
        token = top_idx % V
        is_eos = token == eos_id

        # grow sequences for all 2W candidates
        grown = jnp.take_along_axis(alive_seq, parent[:, :, None], axis=1)
        grown = grown.at[:, :, t].set(token)

        # update finished pool with EOS candidates: only ranks < W qualify
        # (BeamSearchScorer.process skips worse-than-top-W eos tokens), and
        # HF normalizes by the generated length EXCLUDING the eos (= t here:
        # positions 0..t-1 are already filled, this step writes position t)
        norm = top_scores / (jnp.asarray(t, jnp.float32) ** length_penalty)
        rank_ok = jnp.arange(2 * W)[None, :] < W
        cand_fin_scores = jnp.where(is_eos & rank_ok, norm, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], 1)
        all_fin_seq = jnp.concatenate([fin_seq, grown], 1)
        all_fin_lens = jnp.concatenate(
            [fin_lens, jnp.full((B, 2 * W), t + 1, jnp.int32)], 1)
        best_fin, fin_idx = jax.lax.top_k(all_fin_scores, W)
        fin_seq = jnp.take_along_axis(all_fin_seq, fin_idx[:, :, None], 1)
        fin_scores = best_fin
        fin_lens = jnp.take_along_axis(all_fin_lens, fin_idx, 1)

        # alive = best W non-EOS candidates
        alive_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        new_alive_scores, alive_idx = jax.lax.top_k(alive_cand_scores, W)
        alive_seq = jnp.take_along_axis(grown, alive_idx[:, :, None], 1)
        alive_parent = jnp.take_along_axis(parent, alive_idx, 1)   # [B, W]

        parent_global = (jnp.arange(B)[:, None] * W + alive_parent).reshape(-1)
        cache = _gather_beams(cache, parent_global)
        return (alive_seq, new_alive_scores, fin_seq, fin_scores, fin_lens,
                cache)

    state = (alive_seq, alive_scores, fin_seq, fin_scores, fin_lens, cache)
    alive_seq, alive_scores, fin_seq, fin_scores, fin_lens, _ = \
        jax.lax.fori_loop(1, max_new_tokens, body, state)

    # merge: if a batch has no finished beam better than an alive one, use
    # the alive beams (normalized at full length)
    alive_norm = alive_scores / (float(max_new_tokens) ** length_penalty)
    all_scores = jnp.concatenate([fin_scores, alive_norm], 1)
    all_seq = jnp.concatenate([fin_seq, alive_seq], 1)
    all_lens = jnp.concatenate(
        [fin_lens, jnp.full((B, W), max_new_tokens, jnp.int32)], 1)
    best, idx = jax.lax.top_k(all_scores, W)
    return BeamOutput(
        sequences=jnp.take_along_axis(all_seq, idx[:, :, None], 1),
        scores=best,
        lengths=jnp.take_along_axis(all_lens, idx, 1))


def beam_generate(params, cfg: SpeechEncoderDecoderConfig,
                  input_values: jax.Array, audio_mask: Optional[jax.Array],
                  prompt_ids: Optional[jax.Array] = None,
                  num_beams: int = 4, max_new_tokens: int = 150,
                  length_penalty: float = 1.0) -> BeamOutput:
    from mtasr_tpu.generate.engine import _encode_jit
    B = input_values.shape[0]
    if "decoder_lora" in params:
        from mtasr_tpu.train.lora import merge_decoder_lora
        params = merge_decoder_lora(params)
    enc = _encode_jit(params, cfg, input_values, audio_mask)
    bos = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    if cfg.instruct:
        if prompt_ids is None:
            raise ValueError("instruct mode requires prompt_ids")
        prefill_ids = jnp.concatenate([bos, prompt_ids.astype(jnp.int32)], 1)
        splice_index = int(prefill_ids.shape[1]) - 2
    else:
        prefill_ids = bos
        splice_index = 1
    return _beam_impl(params, cfg, enc, prefill_ids, splice_index,
                      int(num_beams), int(max_new_tokens),
                      float(length_penalty))
