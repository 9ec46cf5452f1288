"""Pipelined batch-stream decoding: encode of batch i+1 interleaved INTO
the decode loop of batch i.

Why: at the bench shape (B=256, 10 s, 150 tokens) encode is ~40% of serving
wall and MXU-bound, while the decode loop is HBM-bound (weight streaming) —
the phases are complementary but strictly serial in the plain engine. A TPU
core runs ONE XLA program at a time (measured: two async-dispatched
programs take sum-of-times, overlap_probe round 4), so the only way to
overlap them is inside one program: this engine threads the NEXT batch's
24 WavLM transformer layers through the decode while-loop body, one layer
every k decode steps.

MEASURED NEGATIVE at the bench shape (DESIGN.md round 4): B=256 x 4-batch
stream on the real chip gives 1054.6 RTFx vs 1057.1 sequential — the TPU
core also executes ops WITHIN a program serially (no cross-op
compute/DMA overlap for matmul operand streaming), so interleaving buys
nothing at sizes where both phases are resource-bound. The 34-43% seen on
toy shapes was per-program dispatch amortization, not overlap. Kept as a
serving option (single compiled stream program, fewer dispatches — useful
on high-latency-dispatch runtimes like the tunneled chip).

Token-for-token identical to sequential `generate` (pinned by
tests/test_pipelined.py): the interleaved decode steps are done-masked
no-ops after a row hits <eos>, which is exactly what the plain loop's
early-exit produces in the output; only wall-clock differs.

Serving anchor: replaces the reference's strictly-sequential per-batch
loop (inference_asr.py:171-217 runs encode+decode per sample).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.config import GenerationConfig, SpeechEncoderDecoderConfig
from mtasr_tpu.generate.engine import (
    GenerateOutput, _generate_impl, _prefill, _sample_token,
)
from mtasr_tpu.models.llama import embed_tokens, llama_forward
from mtasr_tpu.models.speech_encoder_decoder import (
    EncodedSpeech, _adapter_callback, bridge_features,
)
from mtasr_tpu.models.wavlm import (
    _lengths_to_mask, conv_output_lengths, feature_encoder,
    layer_norm, linear, wavlm_adapter, wavlm_encoder_layer,
    wavlm_encoder_prologue,
)


# ---------------------------------------------------------------------------
# encode split: frontend (conv + proj + prologue + layer 0) / layers / post
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def _frontend(params, cfg: SpeechEncoderDecoderConfig,
              input_values: jax.Array, audio_mask: Optional[jax.Array]):
    """Conv feature extractor + projection + encoder prologue + layer 0.
    Returns (hidden [B,T0,D], position_bias, feat_mask)."""
    enc_cfg = cfg.encoder
    p = params["encoder"]
    extract = feature_encoder(p["feature_extractor"], enc_cfg, input_values)
    T = extract.shape[1]
    feat_mask = None
    if audio_mask is not None:
        feat_mask = _lengths_to_mask(
            conv_output_lengths(
                enc_cfg, jnp.sum(audio_mask.astype(jnp.int32), -1)), T)
    norm_features = layer_norm(p["feature_projection"]["layer_norm"],
                               extract, enc_cfg.layer_norm_eps)
    hidden = linear(p["feature_projection"]["projection"], norm_features)
    hidden, position_bias = wavlm_encoder_prologue(
        p["encoder"], enc_cfg, hidden, feat_mask)
    hidden = wavlm_encoder_layer(p["encoder"]["layers"]["0"], enc_cfg,
                                 hidden, position_bias, feat_mask)
    return hidden, position_bias, feat_mask


@partial(jax.jit, static_argnames=("cfg",))
def _post_encode(params, cfg: SpeechEncoderDecoderConfig,
                 hidden: jax.Array, audio_mask: Optional[jax.Array]
                 ) -> EncodedSpeech:
    """Final LN + adapter + masks + separator + bridge -> EncodedSpeech.
    Mirrors the tail of wavlm_forward + encode_feats (inference form)."""
    from mtasr_tpu.models.separator import separator_forward
    from mtasr_tpu.models.speech_encoder_decoder import SpeechFeats
    from mtasr_tpu.models.wavlm import feature_vector_attention_mask

    enc_cfg = cfg.encoder
    p = params["encoder"]
    if enc_cfg.do_stable_layer_norm:
        hidden = layer_norm(p["encoder"]["layer_norm"], hidden,
                            enc_cfg.layer_norm_eps)
    mixed = hidden
    if enc_cfg.add_adapter:
        speech, _ = wavlm_adapter(p["adapter"], enc_cfg, hidden)
    else:
        speech = hidden
    B, T8 = speech.shape[:2]
    T0 = mixed.shape[1]
    if audio_mask is not None:
        enc_mask = feature_vector_attention_mask(enc_cfg, T8, audio_mask)
        mask_x0 = feature_vector_attention_mask(enc_cfg, T0, audio_mask,
                                                num_adapter_layers=0)
    else:
        enc_mask = jnp.ones((B, T8), jnp.bool_)
        mask_x0 = jnp.ones((B, T0), jnp.bool_)
    sep_hidden = None
    if cfg.talker_ctc:
        sep_hidden = separator_forward(params["separator"], mixed,
                                       cfg.talker_numbers,
                                       lstm_dropout=cfg.separator_dropout,
                                       deterministic=True)
    feats = SpeechFeats(mixed=mixed, speech=speech, sep_hidden=sep_hidden,
                        enc_mask=enc_mask, mask_x0=mask_x0)
    return bridge_features(params, cfg, feats)


@partial(jax.jit, static_argnames=("cfg",))
def _layers_only(params, cfg: SpeechEncoderDecoderConfig, hidden: jax.Array,
                 position_bias: jax.Array, feat_mask: Optional[jax.Array]):
    """Layers 1..L-1 with nothing to overlap (first batch of a stream)."""
    enc_cfg = cfg.encoder
    layers = params["encoder"]["encoder"]["layers"]
    for i in range(1, enc_cfg.num_hidden_layers):
        hidden = wavlm_encoder_layer(layers[str(i)], enc_cfg, hidden,
                                     position_bias, feat_mask)
    return hidden


# ---------------------------------------------------------------------------
# fused stage: decode batch i + encoder layers of batch i+1 in ONE program
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "gen", "max_new_tokens",
                                   "splice_index"))
def _fused_stage(params, cfg: SpeechEncoderDecoderConfig,
                 enc: EncodedSpeech, prefill_ids: jax.Array,
                 splice_index: int, gen: GenerationConfig,
                 max_new_tokens: int, rng: Optional[jax.Array],
                 hidden_next: jax.Array, posbias_next: jax.Array,
                 featmask_next: Optional[jax.Array]
                 ) -> Tuple[GenerateOutput, jax.Array]:
    dec_cfg = cfg.decoder
    enc_cfg = cfg.encoder
    speech = enc.encoder_hidden_states
    B, Ts = speech.shape[:2]
    Lp = prefill_ids.shape[1]
    total_prefill = Lp + Ts

    cache, last_logits, n_valid, _ = _prefill(
        params, cfg, enc, prefill_ids, splice_index,
        total_prefill + max_new_tokens, gen.kv_quant)
    cb = _adapter_callback(params, cfg, enc)
    eos_id, pad_id = cfg.eos_token_id, cfg.pad_token_id

    rng0, rng = (jax.random.split(rng) if rng is not None else (None, None))
    first_tok = _sample_token(last_logits, gen, rng0)
    out0 = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(first_tok.astype(jnp.int32))
    done0 = first_tok == eos_id

    def decode_body(state):
        """One token step — identical math to engine._generate_impl's body,
        plus an `active` guard so overrun slot steps (t >= max_new_tokens)
        are provable no-ops on out/done (the clamped .at[] write would
        otherwise corrupt the last column)."""
        t, cache, cur_tok, done, out, rng = state
        active = t < max_new_tokens
        emb_t = embed_tokens(params["decoder"], dec_cfg, cur_tok[:, None],
                             dtype=speech.dtype)
        pos_t = (Lp + n_valid)[:, None] - 1 + t
        logits_t, cache = llama_forward(
            params["decoder"], dec_cfg, emb_t, pos_t,
            kv_cache=cache, cache_offset=total_prefill + t - 1,
            layer_callback=cb, logits_to_keep=1)
        step_rng = None
        if rng is not None:
            rng, step_rng = jax.random.split(rng)
        nxt = _sample_token(logits_t[:, -1], gen, step_rng)
        nxt = jnp.where(done | ~active, pad_id, nxt).astype(jnp.int32)
        tcl = jnp.minimum(t, max_new_tokens - 1)
        prev_col = jnp.take_along_axis(out, jnp.full((B, 1), tcl), axis=1)[:, 0]
        out = out.at[:, tcl].set(jnp.where(active, nxt, prev_col))
        done = done | (active & (nxt == eos_id))
        return (t + 1, cache, nxt, done, out, rng)

    # --- interleave: one encoder layer of batch i+1 every k decode steps --
    n_rest = enc_cfg.num_hidden_layers - 1
    state = (jnp.int32(1), cache, first_tok.astype(jnp.int32), done0, out0,
             rng)
    if n_rest > 0:
        layers = params["encoder"]["encoder"]["layers"]
        rest = [layers[str(i)] for i in range(1, enc_cfg.num_hidden_layers)]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rest)
        # k*n_rest <= max_new-1 when possible so slots rarely overrun
        # (overruns are correct but burn masked decode steps)
        k = max(1, (max_new_tokens - 1) // n_rest)

        def slot_body(j, carry):
            state, hidden = carry
            state = jax.lax.fori_loop(0, k, lambda _, s: decode_body(s),
                                      state)
            lp = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, j, 0,
                                                       keepdims=False),
                stacked)
            hidden = wavlm_encoder_layer(lp, enc_cfg, hidden, posbias_next,
                                         featmask_next)
            return (state, hidden)

        state, hidden_next = jax.lax.fori_loop(0, n_rest, slot_body,
                                               (state, hidden_next))

    # --- tail: remaining decode steps with the plain early exit ----------
    def cond(state):
        t, _, _, done, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(done)
    state = jax.lax.while_loop(cond, decode_body, state)
    out = state[4]

    lengths = jnp.sum(out != pad_id, axis=1)
    return GenerateOutput(sequences=out, lengths=lengths), hidden_next


# ---------------------------------------------------------------------------
# stream driver
# ---------------------------------------------------------------------------

def _prompt_layout(cfg: SpeechEncoderDecoderConfig, B: int,
                   prompt_ids: Optional[jax.Array]):
    """[BOS]+prompt prefill ids + splice index (shared engine helper)."""
    from mtasr_tpu.generate.engine import prompt_layout
    return prompt_layout(cfg, B, prompt_ids)


def generate_pipelined(params, cfg: SpeechEncoderDecoderConfig,
                       batches: Sequence[dict],
                       gen: Optional[GenerationConfig] = None,
                       max_new_tokens: Optional[int] = None,
                       rng: Optional[jax.Array] = None
                       ) -> List[GenerateOutput]:
    """Decode a stream of batches with encode(i+1) hidden under decode(i).

    batches: sequence of dicts with keys input_values [B, S],
    audio_mask [B, S] (optional), prompt_ids (instruct only). Batches must
    share shapes (one compiled stage serves the stream). Returns one
    GenerateOutput per batch, token-identical to sequential `generate`.
    """
    gen = gen or GenerationConfig()
    if max_new_tokens is None:
        max_new_tokens = gen.max_new_tokens or gen.max_length
    max_new_tokens = int(max_new_tokens)
    if "decoder_lora" in params:
        from mtasr_tpu.train.lora import merge_decoder_lora
        params = merge_decoder_lora(params)

    outs: List[GenerateOutput] = []
    prev = None  # (enc, prefill_ids, splice_index)
    for i, b in enumerate(batches):
        wav = jnp.asarray(b["input_values"])
        amask = b.get("audio_mask")
        amask = jnp.asarray(amask) if amask is not None else None
        hidden, posb, fmask = _frontend(params, cfg, wav, amask)
        if prev is None:
            hidden = _layers_only(params, cfg, hidden, posb, fmask)
        else:
            step_rng = None
            if rng is not None:
                rng, step_rng = jax.random.split(rng)
            out_prev, hidden = _fused_stage(
                params, cfg, prev[0], prev[1], prev[2], gen, max_new_tokens,
                step_rng, hidden, posb, fmask)
            outs.append(out_prev)
        enc = _post_encode(params, cfg, hidden, amask)
        prefill_ids, splice_index = _prompt_layout(
            cfg, wav.shape[0], b.get("prompt_ids"))
        prev = (enc, prefill_ids, splice_index)

    # last batch decodes alone (nothing left to encode under it)
    step_rng = None
    if rng is not None:
        rng, step_rng = jax.random.split(rng)
    if step_rng is None and gen.do_sample:
        step_rng = jax.random.key(0)
    outs.append(_generate_impl(params, cfg, prev[0], prev[1], prev[2], gen,
                               max_new_tokens, step_rng))
    return outs
