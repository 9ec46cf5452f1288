"""Speculative greedy decoding with the model's own CTC heads as drafter.

Beyond-parity feature (no reference counterpart; the reference decodes one
token at a time through HF GenerationMixin, utils/generation_utils.py:3166).
The multi-talker architecture already computes per-speaker CTC transcripts
for the bridge/refiner (models/ctc_head.py over the separator outputs, cf.
/root/reference/models/modeling_speech_encoder_decoder_llama.py:902-972) —
those ARE a draft of the decoder's serialized (SOT) output, so drafting is
free: `spk0 <sc> spk1 ... <eos>` assembled from the CTC collapse.

Verification is the standard greedy speculative step: one cached decoder
forward scores `spec_k` draft tokens at once; the longest matching prefix is
accepted plus the model's own next token (bonus/correction). The output is
therefore EXACTLY the plain greedy decode, token for token, at any
acceptance rate — under the same arithmetic (pinned bit-exact by the CPU
suite). On TPU the verify chunk's matmul shapes round differently than the
1-token step's, which can flip argmax on NEAR-TIES: measured ~1-2%
flips/token on a random-init model whose top-2 logit gaps sit at rounding
scale, immaterial at trained-model margins (DESIGN.md round 3e).

Regime (measured, DESIGN.md round 3e): the verify forward rides the same
per-step weight stream as a decode step, so speculation pays where that
stream dominates — SMALL BATCH / latency serving (B=32: a 5-token verify
step costs 1.33x a decode step -> up to ~3.8x decode speedup). At
max-throughput batch (B=256) the chunk is MXU-bound (B x spec_k+1 tokens
of full-model FLOPs) and speculation only breaks even per token — leave it
off there.

TPU-native design notes:
* Static shapes everywhere: each verify step is a fixed [B, spec_k+1]
  chunk; acceptance is a data-dependent VALUE, never a shape.
* Rejected drafts leave holes in the preallocated KV cache; holes are
  masked via the cache's key-validity mask and slots advance by the
  batch-max accepted length per step (no compaction copies). Causality is
  slot-ordered, which coincides with time order per row.
* When the slot budget runs low the loop hands off to an exact 1-slot-per-
  token fallback, so truncation can never silently change the output.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.config import GenerationConfig, SpeechEncoderDecoderConfig
from mtasr_tpu.generate.engine import GenerateOutput, _prefill, _prepare
from mtasr_tpu.models.ctc_head import ctc_argmax
from mtasr_tpu.models.llama import KVCache, embed_tokens, llama_forward
from mtasr_tpu.models.speech_encoder_decoder import (
    EncodedSpeech, _adapter_callback, _ctc_head_list,
)
from mtasr_tpu.ops.ctc import ctc_greedy_collapse


@dataclass
class SpecStats:
    spec_steps: jax.Array        # scalar: verify iterations run
    accepted_drafts: jax.Array   # scalar: draft tokens accepted (all rows)
    fallback_steps: jax.Array    # scalar: exact 1-token fallback steps
    emitted: jax.Array           # [B] tokens emitted per row


jax.tree_util.register_dataclass(
    SpecStats, data_fields=["spec_steps", "accepted_drafts",
                            "fallback_steps", "emitted"],
    meta_fields=[])


@partial(jax.jit, static_argnames=("cfg", "max_out_len"))
def ctc_sot_draft(params, cfg: SpeechEncoderDecoderConfig,
                  enc: EncodedSpeech, max_out_len: int = 150) -> jax.Array:
    """Assemble the SOT draft `spk0 <sc> spk1 ... spk{K-1} <eos>` from the
    per-speaker CTC greedy collapses (the reference's
    ctc_remove_duplicates_and_blank semantics). Returns [B, K*max_out_len+K]
    int32, pad-filled past each row's <eos>."""
    K = cfg.talker_numbers
    heads = _ctc_head_list(params, cfg)
    cols, lens = [], []
    for i in range(K):
        path = ctc_argmax(heads[i], enc.sep_hidden[i])
        col, ln = ctc_greedy_collapse(path, enc.mask_x0, cfg.ctc_blank_id,
                                      cfg.pad_token_id, max_out_len)
        cols.append(col)
        lens.append(ln)
    trans = jnp.stack(cols, axis=1)                    # [B, K, max_out_len]
    lens = jnp.stack(lens, axis=1).astype(jnp.int32)   # [B, K]
    B = trans.shape[0]
    # starts[b, i] = sum_{m<i} (len_m + 1): each speaker segment is followed
    # by one boundary token (<sc> between speakers, <eos> after the last)
    starts = jnp.cumsum(
        jnp.pad(lens[:, :-1] + 1, ((0, 0), (1, 0))), axis=1)   # [B, K]
    total = starts[:, -1] + lens[:, -1] + 1                    # incl. <eos>
    Dmax = K * max_out_len + K
    dpos = jnp.arange(Dmax, dtype=jnp.int32)[None, :]          # [1, D]
    s = jnp.sum((dpos[:, :, None] >= starts[:, None, :]).astype(jnp.int32),
                axis=2) - 1                                    # [B, D]
    s = jnp.clip(s, 0, K - 1)
    r = dpos - jnp.take_along_axis(starts, s, axis=1)
    ln_s = jnp.take_along_axis(lens, s, axis=1)
    flat = trans.reshape(B, K * max_out_len)
    tok = jnp.take_along_axis(
        flat, jnp.clip(s * max_out_len + r, 0, K * max_out_len - 1), axis=1)
    boundary = jnp.where(s < K - 1, cfg.sc_token_id, cfg.eos_token_id)
    tok = jnp.where(r < ln_s, tok, boundary)
    return jnp.where(dpos < total[:, None], tok,
                     cfg.pad_token_id).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "gen", "max_new_tokens",
                                   "splice_index", "spec_k", "s_max"))
def _spec_impl(params, cfg: SpeechEncoderDecoderConfig, enc: EncodedSpeech,
               prefill_ids: jax.Array, draft: jax.Array, splice_index: int,
               gen: GenerationConfig, max_new_tokens: int, spec_k: int,
               s_max: int) -> Tuple[GenerateOutput, SpecStats]:
    dec_cfg = cfg.decoder
    speech = enc.encoder_hidden_states
    B = speech.shape[0]
    Lp = prefill_ids.shape[1]
    K1 = spec_k + 1
    Dmax = draft.shape[1]
    eos_id, pad_id = cfg.eos_token_id, cfg.pad_token_id

    cache, last_logits, n_valid, total_prefill = _prefill(
        params, cfg, enc, prefill_ids, splice_index, s_max, gen.kv_quant)
    cb = _adapter_callback(params, cfg, enc)

    first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    # K1 spare columns: each verify step DUS-writes a full K1 window at the
    # per-row offset t (<= max_new), padded past the kept prefix
    out0 = jnp.full((B, max_new_tokens + K1), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(first)
    done0 = (first == eos_id) | (max_new_tokens <= 1)
    t0 = jnp.ones((B,), jnp.int32)        # tokens emitted; cur = out[t-1]
    c0 = jnp.int32(total_prefill)         # next free cache slot
    j_idx = jnp.arange(K1, dtype=jnp.int32)[None, :]

    # token at output index j sits at per-row position Lp + n_valid + j
    # (speech frames occupy positions; padding is compacted — see _prefill)
    pos_base = (Lp + n_valid).astype(jnp.int32)

    def spec_cond(st):
        c, _, _, t, done, _, _ = st
        m = jnp.min(jnp.where(done, max_new_tokens, t))
        # after this chunk the exact 1-token fallback must still be able to
        # finish the worst case (1 slot per remaining token) within s_max —
        # guarantees output exactness for ANY slot budget
        return (~jnp.all(done)) & (c + K1 + (max_new_tokens - m) <= s_max)

    def spec_body(st):
        c, cache, cur, t, done, out, stats = st
        didx = t[:, None] + jnp.arange(spec_k, dtype=jnp.int32)[None, :]
        d = jnp.take_along_axis(draft, jnp.clip(didx, 0, Dmax - 1), axis=1)
        d = jnp.where(didx < Dmax, d, pad_id)
        chunk = jnp.concatenate([cur[:, None], d], axis=1)       # [B, K1]
        pos = pos_base[:, None] - 1 + t[:, None] + j_idx
        emb = embed_tokens(params["decoder"], dec_cfg, chunk,
                           dtype=speech.dtype)
        logits, cache = llama_forward(
            params["decoder"], dec_cfg, emb, pos,
            kv_cache=cache, cache_offset=c, layer_callback=cb)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B, K1]
        # greedy[:, j] = the model's token after consuming chunk[:, :j+1];
        # accept the longest draft prefix that reproduces it
        match = (d == greedy[:, :spec_k])
        acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        within = j_idx <= acc[:, None]           # candidates: acc+1 tokens
        is_eos = within & (greedy == eos_id)
        eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) \
            - is_eos.astype(jnp.int32)           # exclusive prefix count
        keep = (within & (eos_before == 0) & (~done[:, None])
                & ((t[:, None] + j_idx) < max_new_tokens))
        n_emit = jnp.sum(keep.astype(jnp.int32), axis=1)
        toks = jnp.where(keep, greedy, pad_id)
        out = jax.vmap(
            lambda row, w, s: jax.lax.dynamic_update_slice(row, w, (s,))
        )(out, toks, t)
        # chunk slot validity: slot c holds cur (real iff the row was
        # active); slot c+1+j holds draft j, in-stream iff accepted AND kept
        acc_kept = keep[:, :spec_k] & (j_idx[:, :spec_k] < acc[:, None])
        slot_valid = jnp.concatenate([(~done)[:, None], acc_kept], axis=1)
        valid = jax.lax.dynamic_update_slice(cache.valid, slot_valid, (0, c))
        cache = KVCache(k=cache.k, v=cache.v, valid=valid,
                        kv_scale=cache.kv_scale)
        last_kept = jnp.take_along_axis(
            toks, jnp.maximum(n_emit - 1, 0)[:, None], axis=1)[:, 0]
        new_cur = jnp.where(n_emit > 0, last_kept, cur)
        new_done = (done | jnp.any(keep & (greedy == eos_id), axis=1)
                    | ((t + n_emit) >= max_new_tokens))
        n_acc = jnp.sum(acc_kept.astype(jnp.int32), axis=1)
        # advance past the longest accepted run; shorter rows leave masked
        # holes that stay dead (valid=False) — no compaction copies
        adv = 1 + jnp.max(n_acc)
        stats = stats + jnp.stack([jnp.int32(1), jnp.sum(n_acc)])
        return (c + adv, cache, new_cur, t + n_emit, new_done, out, stats)

    state = (c0, cache, first, t0, done0, out0,
             jnp.zeros((2,), jnp.int32))
    c, cache, cur, t, done, out, stats = jax.lax.while_loop(
        spec_cond, spec_body, state)
    c_spec_end = c

    # exact 1-token fallback: finishes any rows the slot budget cut short
    def fb_cond(st):
        c, _, _, _, done, _ = st
        return (~jnp.all(done)) & (c < s_max)

    def fb_body(st):
        c, cache, cur, t, done, out = st
        pos = (pos_base - 1 + t)[:, None]
        emb = embed_tokens(params["decoder"], dec_cfg, cur[:, None],
                           dtype=speech.dtype)
        logits, cache = llama_forward(
            params["decoder"], dec_cfg, emb, pos,
            kv_cache=cache, cache_offset=c, layer_callback=cb,
            logits_to_keep=1)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        out = jax.vmap(
            lambda row, v, s: jax.lax.dynamic_update_slice(row, v, (s,))
        )(out, nxt[:, None], t)
        new_t = t + jnp.where(done, 0, 1)
        new_done = done | (nxt == eos_id) | (new_t >= max_new_tokens)
        new_cur = jnp.where(done, cur, nxt)
        return (c + 1, cache, new_cur, new_t, new_done, out)

    c, cache, cur, t, done, out = jax.lax.while_loop(
        fb_cond, fb_body, (c, cache, cur, t, done, out))

    out = out[:, :max_new_tokens]
    lengths = jnp.sum(out != pad_id, axis=1)
    return (GenerateOutput(sequences=out, lengths=lengths),
            SpecStats(spec_steps=stats[0], accepted_drafts=stats[1],
                      fallback_steps=c - c_spec_end, emitted=t))


def generate_speculative(
    params, cfg: SpeechEncoderDecoderConfig,
    input_values: jax.Array, audio_mask: Optional[jax.Array],
    prompt_ids: Optional[jax.Array] = None,
    gen: Optional[GenerationConfig] = None,
    max_new_tokens: Optional[int] = None,
    draft_tokens: Optional[jax.Array] = None,
) -> Tuple[GenerateOutput, SpecStats]:
    """Greedy speculative decode; output is token-identical to
    `generate(...)` with do_sample=False. `draft_tokens` [B, D] overrides
    the CTC drafter (used by tests and for external draft models)."""
    gen = gen or GenerationConfig(speculative="ctc")
    if gen.do_sample:
        raise ValueError("speculative decoding is greedy-only "
                         "(verification assumes argmax sampling)")
    if max_new_tokens is None:
        max_new_tokens = gen.max_new_tokens or gen.max_length
    max_new_tokens = int(max_new_tokens)
    params, enc, prefill_ids, splice_index = _prepare(
        params, cfg, input_values, audio_mask, prompt_ids, gen)
    if draft_tokens is None:
        mode = gen.speculative or "ctc"
        if mode != "ctc":
            raise ValueError(f"unknown speculative draft source: {mode!r}")
        if not (cfg.talker_ctc and cfg.talker_numbers >= 1):
            raise ValueError("speculative='ctc' needs talker_ctc CTC heads "
                             "(cfg.talker_ctc=True)")
        draft_tokens = ctc_sot_draft(params, cfg, enc,
                                     max_out_len=max_new_tokens)
    total_prefill = prefill_ids.shape[1] + enc.encoder_hidden_states.shape[1]
    spec_k = int(gen.spec_k)
    gen_slots = max(int(gen.spec_cache_factor * max_new_tokens),
                    max_new_tokens)
    s_max = total_prefill + gen_slots + spec_k + 1
    return _spec_impl(params, cfg, enc, jnp.asarray(prefill_ids),
                      jnp.asarray(draft_tokens, jnp.int32).reshape(
                          input_values.shape[0], -1),
                      splice_index, gen, max_new_tokens, spec_k, s_max)
