"""Autoregressive generation engine: prefill/decode split over a
preallocated KV cache, batched, fully jit-compiled.

Replaces the reference's vendored HF generation loop
(/root/reference/utils/generation_utils.py — GenerationMixin_Instruct) and
its per-sample Python decode loop (inference_asr.py:171-217):

* `generate`  — encoder once, splice `[prefix | speech | suffix]` embeddings
  into one prefill pass (the reference's first-iteration splice,
  modeling_llama.py:170-228), then a lax.while_loop of single-token steps
  with early exit when every row has emitted <eos>. Prompt handling matches
  GenerationMixin_Instruct: decoder input = [BOS] + prompt_ids
  (generation_utils.py:2083-2085).
* `generate_ctc` — the non-autoregressive one-shot CTC decode
  (generation_ctc_utils.py:3244-3248 -> model.forward_ctc).

Greedy + temperature/top-k/top-p sampling (reference run scripts use greedy,
num_beams=1: inference_asr.py:184-200). Batched decode differs from the
reference in one deliberate way: padded speech frames are masked out of
attention (the reference decodes one utterance at a time so padding never
arises there).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtasr_tpu.config import GenerationConfig, SpeechEncoderDecoderConfig
from mtasr_tpu.models.llama import (
    KVCache, embed_tokens, llama_forward, lm_head,
)
from mtasr_tpu.models.speech_encoder_decoder import (
    EncodedSpeech, _adapter_callback, encode_speech, forward_ctc,
)


@dataclass
class GenerateOutput:
    sequences: jax.Array      # [B, max_new_tokens] generated tokens (pad-filled)
    lengths: jax.Array        # [B] number of generated tokens incl. eos
    scores: Optional[jax.Array] = None


jax.tree_util.register_dataclass(GenerateOutput,
                                 data_fields=["sequences", "lengths", "scores"],
                                 meta_fields=[])

# encode once per utterance, fully jitted (the eager per-op dispatch of the
# encoder dominated wall time otherwise: 2.7s -> 0.7s per batch on v5e)
_encode_jit = jax.jit(encode_speech, static_argnames=("cfg",))


def prompt_layout(cfg, B: int, prompt_ids):
    """[BOS]+prompt prefill ids + splice index for instruct mode, or plain
    [BOS] otherwise. Batched decode uses ONE prompt layout for the whole
    batch (the reference decodes per-sample, inference_asr.py:171-217, so
    any mix of prompts is honored there). A padded shorter prompt would
    be silently mis-spliced — detect and refuse. The pipeline groups
    batches by prompt length (batches_from_examples) so real decode runs
    never trip this. Shared by the greedy/sampling engine, beam search,
    and the pipelined stream engine."""
    import numpy as np
    bos = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    if not cfg.instruct:
        return bos, 1
    if prompt_ids is None:
        raise ValueError("instruct mode requires prompt_ids")
    tail = np.asarray(prompt_ids[:, -3:])
    expected = np.asarray([cfg.boss_token_id, cfg.eoss_token_id,
                           cfg.bosr_token_id])
    if not (tail == expected[None, :]).all():
        bad = np.nonzero(~(tail == expected[None, :]).all(axis=1))[0]
        raise ValueError(
            "heterogeneous prompt layouts in one batch: rows "
            f"{bad.tolist()} do not end with <boss><eoss><bosr> — "
            "group the batch by prompt length (the data pipeline's "
            "batches_from_examples does this) or decode them "
            "separately")
    prefill_ids = jnp.concatenate([bos, prompt_ids.astype(jnp.int32)],
                                  axis=1)
    # [BOS bosp prompt(P) eosp boss | eoss bosr]: splice after <boss>
    return prefill_ids, int(prefill_ids.shape[1]) - 2


def encode_maybe_chunked(params, cfg, input_values, audio_mask, chunk):
    """Encode the batch, optionally in row chunks: bounds the encoder's
    peak HBM (conv-frontend intermediates scale with rows) while the
    decode still runs at full B; the same compiled encode program serves
    every full-size chunk. Chunk-invariant by construction: the encoder
    has no cross-row coupling (test_generate.py pins batch invariance of
    the whole pipeline). Shared by the greedy/sampling engine and beam
    search."""
    B = input_values.shape[0]
    if chunk is not None and 0 < chunk < B:
        encs = []
        for i in range(0, B, chunk):
            m = audio_mask[i:i + chunk] if audio_mask is not None else None
            encs.append(_encode_jit(params, cfg, input_values[i:i + chunk],
                                    m))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *encs)
    return _encode_jit(params, cfg, input_values, audio_mask)


def _sample_token(logits: jax.Array, gen: GenerationConfig,
                  rng: Optional[jax.Array]) -> jax.Array:
    """logits [B, V] -> token [B]."""
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits / jnp.maximum(gen.temperature, 1e-6)
    if gen.top_k and gen.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -gen.top_k][:, None]
        logits = jnp.where(logits < kth, -1e30, logits)
    if gen.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gen.top_p, axis=-1)
        kth = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < kth, -1e30, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def _prefill(params, cfg: SpeechEncoderDecoderConfig, enc: EncodedSpeech,
             prefill_ids: jax.Array, splice_index: int, S_max: int,
             kv_quant: bool):
    """Splice [prefix | speech | suffix] embeddings, run the prefill pass
    into a fresh KV cache, and return (cache, last_logits, n_valid,
    total_prefill). Shared by the plain and speculative decode loops."""
    dec_cfg = cfg.decoder
    speech = enc.encoder_hidden_states
    B, Ts = speech.shape[:2]
    Lp = prefill_ids.shape[1]
    total_prefill = Lp + Ts

    emb = embed_tokens(params["decoder"], dec_cfg, prefill_ids,
                       dtype=speech.dtype)
    inputs_embeds = jnp.concatenate(
        [emb[:, :splice_index], speech, emb[:, splice_index:]], axis=1)
    key_valid = jnp.concatenate([
        jnp.ones((B, splice_index), jnp.bool_),
        enc.encoder_attention_mask,
        jnp.ones((B, Lp - splice_index), jnp.bool_),
    ], axis=1)
    # Per-row position compaction: the reference decodes one utterance at a
    # time (inference_asr.py:171-217), so a row's suffix/generated tokens
    # sit immediately after its TRUE speech length. In a padded batch the
    # speech block is Ts frames for every row (valid frames first, padding
    # tail); masking hides padded keys' content but not the position shift
    # — so suffix positions are compacted per row (idx - Ts + n_valid),
    # making batched decode token-identical to per-sample decode
    # (test_reference_ab.py::test_generate_parity_*).
    n_valid = jnp.sum(enc.encoder_attention_mask.astype(jnp.int32), axis=1)
    idx = jnp.arange(total_prefill, dtype=jnp.int32)[None, :]
    position_ids = jnp.where(idx < splice_index + Ts, idx,
                             idx - Ts + n_valid[:, None])

    cache = KVCache.init(dec_cfg, B, S_max, dtype=speech.dtype,
                         quantized=kv_quant)
    cb = _adapter_callback(params, cfg, enc)
    if Lp > splice_index:
        # suffix tokens (<eoss><bosr>) follow the speech block: the last
        # real element is the last suffix token — same index for all rows
        logits, cache = llama_forward(
            params["decoder"], dec_cfg, inputs_embeds, position_ids,
            key_valid_mask=key_valid, kv_cache=cache, cache_offset=0,
            layer_callback=cb, logits_to_keep=1)
        last_logits = logits[:, -1]
    else:
        # non-instruct ([BOS | speech]): the last real element is the last
        # VALID speech frame, which differs per row in a padded batch —
        # gather it, then lm_head on just those rows (the reference decodes
        # per-sample so its last position is always the true one)
        hidden, cache = llama_forward(
            params["decoder"], dec_cfg, inputs_embeds, position_ids,
            key_valid_mask=key_valid, kv_cache=cache, cache_offset=0,
            layer_callback=cb, compute_logits=False)
        last_idx = (splice_index + n_valid - 1).astype(jnp.int32)
        h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
        last_logits = lm_head(params["decoder"], dec_cfg, h_last)[:, 0]
    return cache, last_logits, n_valid, total_prefill


@partial(jax.jit, static_argnames=("cfg", "gen", "max_new_tokens",
                                   "splice_index"))
def _generate_impl(params, cfg: SpeechEncoderDecoderConfig,
                   enc: EncodedSpeech, prefill_ids: jax.Array,
                   splice_index: int, gen: GenerationConfig,
                   max_new_tokens: int, rng: jax.Array) -> GenerateOutput:
    dec_cfg = cfg.decoder
    speech = enc.encoder_hidden_states
    B, Ts = speech.shape[:2]
    Lp = prefill_ids.shape[1]
    total_prefill = Lp + Ts
    S_max = total_prefill + max_new_tokens

    cache, last_logits, n_valid, _ = _prefill(
        params, cfg, enc, prefill_ids, splice_index, S_max, gen.kv_quant)
    cb = _adapter_callback(params, cfg, enc)

    eos_id = cfg.eos_token_id
    pad_id = cfg.pad_token_id

    rng0, rng = (jax.random.split(rng) if rng is not None else (None, None))
    first_tok = _sample_token(last_logits, gen, rng0)
    out0 = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(first_tok.astype(jnp.int32))
    done0 = first_tok == eos_id

    def cond(state):
        t, _, _, done, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, cache, cur_tok, done, out, rng = state
        emb_t = embed_tokens(params["decoder"], dec_cfg, cur_tok[:, None],
                             dtype=speech.dtype)
        # cur_tok was generated at step t-1 -> absolute position
        # Lp + n_valid + t - 1 per row (speech frames occupy cache slots
        # like tokens; positions use the row's true speech length)
        pos_t = (Lp + n_valid)[:, None] - 1 + t
        logits_t, cache = llama_forward(
            params["decoder"], dec_cfg, emb_t, pos_t,
            kv_cache=cache, cache_offset=total_prefill + t - 1,
            layer_callback=cb, logits_to_keep=1)
        step_rng = None
        if rng is not None:
            rng, step_rng = jax.random.split(rng)
        nxt = _sample_token(logits_t[:, -1], gen, step_rng)
        nxt = jnp.where(done, pad_id, nxt).astype(jnp.int32)
        out = out.at[:, t].set(nxt)
        done = done | (nxt == eos_id)
        return (t + 1, cache, nxt, done, out, rng)

    # NOTE on positions: generated token t sits at absolute position
    # total_prefill + t, matching the reference's cache_position arithmetic
    # where speech frames occupy positions (modeling_llama.py:200-219).
    state = (jnp.int32(1), cache, first_tok.astype(jnp.int32), done0, out0, rng)
    _, _, _, _, out, _ = jax.lax.while_loop(cond, body, state)

    not_pad = out != pad_id
    lengths = jnp.sum(not_pad, axis=1)
    return GenerateOutput(sequences=out, lengths=lengths)


def _prepare(params, cfg: SpeechEncoderDecoderConfig,
             input_values: jax.Array, audio_mask: Optional[jax.Array],
             prompt_ids: Optional[jax.Array], gen: GenerationConfig):
    """Shared decode-entry preprocessing: LoRA fold, (chunked) encode,
    prompt layout validation. Returns (params, enc, prefill_ids,
    splice_index)."""
    B = input_values.shape[0]

    if "decoder_lora" in params:
        # fold LoRA into the decoder weights once per call (exact at
        # inference: dropout is off, so activation-level application and the
        # merged weights are identical — utils/merge_adapter.py semantics)
        from mtasr_tpu.train.lora import merge_decoder_lora
        params = merge_decoder_lora(params)

    enc = encode_maybe_chunked(params, cfg, input_values, audio_mask,
                               gen.encode_chunk)
    bos = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    if cfg.instruct:
        prefill_ids, splice_index = prompt_layout(cfg, B, prompt_ids)
    else:
        prefill_ids = bos
        splice_index = 1
    return params, enc, prefill_ids, splice_index


def generate(params, cfg: SpeechEncoderDecoderConfig,
             input_values: jax.Array, audio_mask: Optional[jax.Array],
             prompt_ids: Optional[jax.Array] = None,
             gen: Optional[GenerationConfig] = None,
             rng: Optional[jax.Array] = None,
             max_new_tokens: Optional[int] = None) -> GenerateOutput:
    """Batched AR decode. prompt_ids: [B, P_total] instruct prompt token ids
    WITHOUT BOS (= tokenizer(prompt_str)[1:], vectorized_dataset_utils.py:98);
    must contain the <boss>/<eoss>/<bosr> specials. All rows must share one
    prompt layout (the reference assumes identical prompts, see TODO at
    modeling...llama.py:713-715)."""
    gen = gen or GenerationConfig()
    if max_new_tokens is None:
        max_new_tokens = gen.max_new_tokens or gen.max_length
    if gen.speculative:
        import logging

        from mtasr_tpu.generate.speculative import generate_speculative
        out, st = generate_speculative(
            params, cfg, input_values, audio_mask, prompt_ids=prompt_ids,
            gen=gen, max_new_tokens=max_new_tokens)
        # draft quality is the whole game (DESIGN.md round 3e) — surface it
        emitted = max(int(jnp.sum(st.emitted)), 1)
        logging.getLogger("mtasr_tpu.generate").info(
            "speculative: %d verify + %d fallback steps, %d/%d tokens from "
            "accepted drafts (%.0f%%)", int(st.spec_steps),
            int(st.fallback_steps), int(st.accepted_drafts), emitted,
            100.0 * int(st.accepted_drafts) / emitted)
        return out
    params, enc, prefill_ids, splice_index = _prepare(
        params, cfg, input_values, audio_mask, prompt_ids, gen)
    if rng is None and gen.do_sample:
        rng = jax.random.key(0)
    return _generate_impl(params, cfg, enc, prefill_ids, splice_index, gen,
                          int(max_new_tokens), rng)


_forward_ctc_jit = jax.jit(forward_ctc, static_argnames=("cfg", "max_out_len"))


def generate_ctc(params, cfg: SpeechEncoderDecoderConfig,
                 input_values: jax.Array, audio_mask: Optional[jax.Array],
                 max_out_len: int = 150) -> Tuple[jax.Array, jax.Array]:
    """One-shot CTC decode (GenerationMixin_CTC._sample_ctc ->
    forward_ctc)."""
    return _forward_ctc_jit(params, cfg, input_values, audio_mask,
                            max_out_len=max_out_len)
