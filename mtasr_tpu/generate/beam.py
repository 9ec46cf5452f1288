"""Batched KV-cached beam search.

The reference vendors HF's full beam machinery (utils/generation_utils.py:
3379 beam_search) though every run script decodes greedily; this provides
the `num_beams > 1` path TPU-natively: beams folded into the batch dim
(B*W rows), cache rows gathered by beam parent each step, alive/finished
bookkeeping in the standard t5x style, all inside one lax.fori_loop.

Scores follow HF semantics: sum of token log-probs, final ranking by
score / length**length_penalty (length_penalty=1.0 default).
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

    # ---- prefill on B rows ----
    emb = embed_tokens(params["decoder"], dec_cfg, prefill_ids,
                       dtype=speech.dtype)
    inputs_embeds = jnp.concatenate(
        [emb[:, :splice_index], speech, emb[:, splice_index:]], axis=1)
    key_valid = jnp.concatenate([
        jnp.ones((B, splice_index), jnp.bool_),
        enc.encoder_attention_mask,
        jnp.ones((B, Lp - splice_index), jnp.bool_)], axis=1)
    pos = jnp.broadcast_to(jnp.arange(total_prefill)[None, :],
                           (B, total_prefill))
    cache = KVCache.init(dec_cfg, B, S_max, dtype=speech.dtype)
    cb = _adapter_callback(params, cfg, enc)
    logits, cache = llama_forward(
        params["decoder"], dec_cfg, inputs_embeds, pos,
        key_valid_mask=key_valid, kv_cache=cache, cache_offset=0,
        layer_callback=cb, logits_to_keep=1)

    # ---- init beams from first-token top-W ----
    logp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)  # [B,V]
    init_scores, init_toks = jax.lax.top_k(logp0, W)                   # [B,W]
    cache = _expand_beams(cache, W)            # rows b*W + w
    # adapter memory is captured in the callback closure over enc (B rows);
    # expand it too so per-step decode sees B*W rows
    enc_bw = _expand_beams(enc, W)
    cb_bw = _adapter_callback(params, cfg, enc_bw)

    alive_seq = jnp.full((B, W, max_new_tokens), pad_id, jnp.int32)
    alive_seq = alive_seq.at[:, :, 0].set(init_toks)
    alive_scores = init_scores
    alive_is_eos = init_toks == eos_id
    # beams that started with EOS: move to finished
    fin_seq = jnp.full((B, W, max_new_tokens), pad_id, jnp.int32)
    fin_scores = jnp.full((B, W), NEG_INF)
    fin_lens = jnp.zeros((B, W), jnp.int32)
    fin_seq = jnp.where(alive_is_eos[:, :, None], alive_seq, fin_seq)
    fin_scores = jnp.where(alive_is_eos,
                           alive_scores / (1.0 ** length_penalty), fin_scores)
    fin_lens = jnp.where(alive_is_eos, 1, fin_lens)
    alive_scores = jnp.where(alive_is_eos, NEG_INF, alive_scores)

    def body(t, state):
        alive_seq, alive_scores, fin_seq, fin_scores, fin_lens, cache = state
        cur = alive_seq[:, :, t - 1].reshape(B * W)
        emb_t = embed_tokens(params["decoder"], dec_cfg, cur[:, None],
                             dtype=speech.dtype)
        pos_t = jnp.full((B * W, 1), total_prefill + t - 1)
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

        # update finished pool with EOS candidates
        norm = top_scores / ((t + 1.0) ** length_penalty)
        cand_fin_scores = jnp.where(is_eos, norm, NEG_INF)
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
