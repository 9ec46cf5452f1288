"""Composite speech-encoder-decoder: WavLM -> (separator -> K CTC heads ->
refiners/bridges) -> projection -> LLaMA with speech splicing.

Re-design of
/root/reference/models/modeling_speech_encoder_decoder_llama.py
(SpeechEncoderDecoderModelLlama). Structural changes for TPU/XLA:

* Static splice layout. The reference scans input_ids for <boss>/<eoss> at
  runtime; here the collator guarantees a fixed `[prefix | speech | suffix]`
  layout and passes `splice_index` as a static int (non-instruct: 1, i.e.
  right after BOS — modeling_llama.py:188-226; instruct: prompt_len + 4, the
  slot between <bos_speech> and <eos_speech> — modeling_llama.py:171-223).
* Label surgery is split: host-side (shift, <sc> split, eos insertion —
  data/labels.py) where dynamic shapes are free, and in-graph (speech-length
  ignore prefix, reference lines 696-742) where lengths are static.
* Per-sample CTC-collapse Python loops (reference 902-972) are the
  vectorized ops in ops/ctc.py.

Loss semantics match HybridLoss wiring (reference 772-789): CE over the
spliced label layout + serialized CTC on 50 Hz pre-adapter features with
conv-only (`_x0`) length masks (reference 582-588).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.config import SpeechEncoderDecoderConfig
from mtasr_tpu.models import llama as llama_mod
from mtasr_tpu.models.adapters import adapter_forward, init_adapter_params
from mtasr_tpu.models.bridges import (
    build_multi_ctc_prefix, ctc_token_builder, frame_refiner_forward,
    init_frame_refiner_params,
)
from mtasr_tpu.models.ctc_head import ctc_argmax, init_ctc_params
from mtasr_tpu.models.layers import linear, linear_init
from mtasr_tpu.models.llama import KVCache, embed_tokens, llama_forward
from mtasr_tpu.models.losses import hybrid_loss
from mtasr_tpu.models.separator import init_separator_params, separator_forward
from mtasr_tpu.models.wavlm import (
    feature_vector_attention_mask, init_wavlm_params, wavlm_adapter,
    wavlm_forward,
)
from mtasr_tpu.ops.ctc import ctc_greedy_collapse


@dataclass
class EncodedSpeech:
    """Everything the decoder side needs, computed once per utterance
    (mirrors the reference's cached encoder_outputs at generation time,
    generation_utils.py:2065-2069)."""
    encoder_hidden_states: jax.Array          # [B, Ts, H_dec] decoder memory
    encoder_attention_mask: jax.Array         # [B, Ts] True=valid
    sep_hidden: Optional[List[jax.Array]]     # K x [B, T0, D]
    mask_x0: Optional[jax.Array]              # [B, T0] True=valid (50 Hz)
    acoustic_mem: Optional[jax.Array]         # adapter memory [B, Tm, D]
    acoustic_pad_mask: Optional[jax.Array]    # [B, Tm] True=PADDING
    acoustic_conf: Optional[jax.Array]        # [B, Tm]


jax.tree_util.register_dataclass(
    EncodedSpeech,
    data_fields=["encoder_hidden_states", "encoder_attention_mask",
                 "sep_hidden", "mask_x0", "acoustic_mem", "acoustic_pad_mask",
                 "acoustic_conf"],
    meta_fields=[])


@dataclass
class ForwardOutput:
    loss: Optional[jax.Array]
    logits: jax.Array
    aux: Dict[str, jax.Array] = field(default_factory=dict)


jax.tree_util.register_dataclass(ForwardOutput,
                                 data_fields=["loss", "logits", "aux"],
                                 meta_fields=[])


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def init_model_params(key: jax.Array, cfg: SpeechEncoderDecoderConfig,
                      dtype=jnp.float32) -> dict:
    cfg.validate()
    # special tokens must live inside the decoder vocab (the reference grows
    # the embedding table at assembly: create_from_pretrained.py:276)
    max_special = max(cfg.pad_token_id, cfg.sc_token_id,
                      cfg.eosr_token_id if cfg.instruct else 0)
    if max_special >= cfg.decoder.vocab_size:
        raise ValueError(
            f"special token id {max_special} >= decoder vocab_size "
            f"{cfg.decoder.vocab_size}; resize the vocab (the assembly CLI "
            "does this automatically)")
    ks = jax.random.split(key, 8)
    p: dict = {
        "encoder": init_wavlm_params(ks[0], cfg.encoder, dtype),
        "decoder": llama_mod.init_llama_params(ks[1], cfg.decoder, dtype),
    }
    enc_out_dim = cfg.encoder.out_hidden
    # The serialized-CTC stack consumes the PRE-adapter 50 Hz features, whose
    # dim is hidden_size. (The reference passes output_hidden_size there —
    # modeling_speech_encoder_decoder_llama.py:183,191 — which only works
    # because its recipes keep output_hidden_size == hidden_size.)
    d50 = cfg.encoder.hidden_size
    if enc_out_dim != cfg.decoder.hidden_size:
        p["enc_to_dec_proj"] = linear_init(ks[2], enc_out_dim,
                                           cfg.decoder.hidden_size, dtype=dtype)
    if cfg.talker_ctc:
        p["separator"] = init_separator_params(
            ks[3], d50, cfg.separator_hidden, cfg.talker_numbers, dtype=dtype)
        heads = {}
        for i, hk in enumerate(jax.random.split(ks[4], cfg.talker_numbers)):
            heads[str(i)] = init_ctc_params(hk, d50, cfg.ctc_odim, dtype)
        p["serialized_ctc"] = heads
    if cfg.talker_ctc_refine:
        p["serilized_refine"] = init_frame_refiner_params(ks[5], d50,
                                                          dtype=dtype)
    if cfg.ctc_bridge and cfg.ctc_bridge_type == "softmax":
        from mtasr_tpu.models.refiners import init_extractor_concat
        p["ctc_extractor_concat"] = init_extractor_concat(
            ks[7], d50, enc_out_dim, cfg.talker_numbers, use_repair=True,
            dtype=dtype)
    if cfg.decoder_cross_attention:
        adap = {}
        for i, ak in enumerate(jax.random.split(
                ks[6], cfg.decoder.num_hidden_layers)):
            adap[str(i)] = init_adapter_params(
                ak, cfg.decoder_cross_attention_type,
                cfg.decoder.hidden_size, d50, cfg.cross_attn_dim,
                r_max=cfg.r_max, lora_alpha=cfg.lora_alpha, dtype=dtype)
        p["cross_att_adap"] = adap
    return p


def _ctc_head_list(params: dict, cfg: SpeechEncoderDecoderConfig) -> List[dict]:
    return [params["serialized_ctc"][str(i)] for i in range(cfg.talker_numbers)]


def _proj_to_decoder(params: dict, x: jax.Array) -> jax.Array:
    if "enc_to_dec_proj" in params:
        return linear(params["enc_to_dec_proj"], x)
    return x


def align_mask_len(mask: jax.Array, t_target: int) -> jax.Array:
    """Match a [B, T] mask to t_target frames the way the reference does
    (modeling_speech_encoder_decoder_llama.py:76-84): truncate when longer,
    pad by repeating the last column when shorter (the last column is
    normally already padding/0, so the repeat extends the padded tail)."""
    t = mask.shape[1]
    if t == t_target:
        return mask
    if t > t_target:
        return mask[:, :t_target]
    pad = jnp.repeat(mask[:, -1:], t_target - t, axis=1)
    return jnp.concatenate([mask, pad], axis=1)


# ---------------------------------------------------------------------------
# encode (shared by training forward, generate prefill, and forward_ctc)
# ---------------------------------------------------------------------------
@dataclass
class SpeechFeats:
    """Stage-A output: everything produced by the SHARED params
    (encoder + separator), before the rest-param bridge/refiner stage.
    The split lets PCGrad (train/train_step.py) pull the total loss back
    through the cheap bridge only — its shared-subtree gradient is
    discarded by the reference's overwrite (trainer_seq2seq.py:1140-1144),
    so the encoder backward for it is pure waste."""
    mixed: jax.Array                          # [B, T0, D] 50 Hz features
    speech: jax.Array                         # [B, T8, D] 8x features
    sep_hidden: Optional[List[jax.Array]]     # K x [B, T0, D] pre-refine
    enc_mask: jax.Array                       # [B, T8] True=valid
    mask_x0: jax.Array                        # [B, T0] True=valid


jax.tree_util.register_dataclass(
    SpeechFeats,
    data_fields=["mixed", "speech", "sep_hidden", "enc_mask", "mask_x0"],
    meta_fields=[])


def encode_feats(
    params: dict, cfg: SpeechEncoderDecoderConfig,
    input_values: jax.Array, audio_mask: Optional[jax.Array],
    *,
    mask_time_indices: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> SpeechFeats:
    """Stage A: WavLM encoder + speaker separator (shared params only)."""
    enc = wavlm_forward(params["encoder"], cfg.encoder, input_values,
                        audio_mask, mask_time_indices=mask_time_indices,
                        deterministic=deterministic, rng=rng)
    mixed = enc.encoder_hidden_state                  # [B, T0, D] 50 Hz
    speech = enc.last_hidden_state                    # [B, T8, D]
    B, T8 = speech.shape[:2]
    T0 = mixed.shape[1]

    if audio_mask is not None:
        enc_mask = feature_vector_attention_mask(cfg.encoder, T8, audio_mask)
        mask_x0 = feature_vector_attention_mask(cfg.encoder, T0, audio_mask,
                                                num_adapter_layers=0)
    else:
        enc_mask = jnp.ones((B, T8), jnp.bool_)
        mask_x0 = jnp.ones((B, T0), jnp.bool_)

    sep_hidden = None
    if cfg.talker_ctc:
        sep_hidden = separator_forward(params["separator"], mixed,
                                       cfg.talker_numbers,
                                       lstm_dropout=cfg.separator_dropout,
                                       deterministic=deterministic, rng=rng)
    return SpeechFeats(mixed=mixed, speech=speech, sep_hidden=sep_hidden,
                       enc_mask=enc_mask, mask_x0=mask_x0)


def bridge_features(
    params: dict, cfg: SpeechEncoderDecoderConfig, feats: SpeechFeats,
    *,
    ctc_prompt_max_len: int = 64,
) -> EncodedSpeech:
    """Stage B: refiner + CTC bridge + adapter memory (rest params; the
    'raw' bridge also reads the shared encoder adapter, whose PCGrad
    gradient is identically zero — heads don't depend on it and the
    total-loss shared grad is overwritten)."""
    mixed, speech = feats.mixed, feats.speech
    enc_mask, mask_x0 = feats.enc_mask, feats.mask_x0
    sep_hidden = feats.sep_hidden
    if cfg.talker_ctc and cfg.talker_ctc_refine:
        sep_hidden = frame_refiner_forward(
            params["serilized_refine"], sep_hidden, mixed, mask_x0,
            _ctc_head_list(params, cfg), cfg.ctc_blank_id)
    B = mixed.shape[0]

    # --- decoder memory path ---
    encoder_hidden_states = _proj_to_decoder(params, speech)
    encoder_attention_mask = enc_mask

    if cfg.ctc_bridge and cfg.ctc_bridge_type == "raw":
        # concat separated 50 Hz streams -> encoder adapter -> proj
        # (reference 631-641)
        x_ref = jnp.concatenate(sep_hidden, axis=1)
        x_ref, _ = wavlm_adapter(params["encoder"]["adapter"], cfg.encoder, x_ref)
        encoder_hidden_states = _proj_to_decoder(params, x_ref)
        rep = jnp.tile(enc_mask, (1, cfg.talker_numbers))
        encoder_attention_mask = align_mask_len(
            rep, encoder_hidden_states.shape[1])
    elif cfg.ctc_bridge and cfg.ctc_bridge_type == "softmax":
        # soft per-speaker routing of the mixed 50 Hz features, concat K
        # streams along time (CTCPerSpeakerExtractorConcatSoftmax; the
        # reference constructs this for ctc_bridge_type='softmax' at
        # modeling...llama.py:264-275)
        from mtasr_tpu.models.ctc_head import ctc_logits
        from mtasr_tpu.models.refiners import extractor_concat_softmax
        heads = _ctc_head_list(params, cfg)
        logits_list = [ctc_logits(heads[i], sep_hidden[i])
                       for i in range(cfg.talker_numbers)]
        x_cat = extractor_concat_softmax(
            params["ctc_extractor_concat"], mixed, cfg.ctc_blank_id,
            logits_list, cfg.talker_numbers)
        encoder_hidden_states = _proj_to_decoder(params, x_cat)
        encoder_attention_mask = jnp.tile(mask_x0, (1, cfg.talker_numbers))
    elif cfg.ctc_bridge and cfg.ctc_bridge_type == "ctcprompt":
        # collapsed per-speaker CTC transcripts embedded as a prefix
        # (reference 643-668)
        transcripts = []
        heads = _ctc_head_list(params, cfg)
        for i in range(cfg.talker_numbers):
            path = ctc_argmax(heads[i], sep_hidden[i])
            col, _ = ctc_greedy_collapse(path, mask_x0, cfg.ctc_blank_id,
                                         cfg.pad_token_id, ctc_prompt_max_len)
            transcripts.append(col)
        embed_table = params["decoder"]["model"]["embed_tokens"]["weight"]
        pre_emb, pre_mask, _ = build_multi_ctc_prefix(
            transcripts, embed_table.astype(encoder_hidden_states.dtype),
            cfg.pad_token_id, ctc_prompt_max_len)
        encoder_hidden_states = jnp.concatenate(
            [pre_emb, encoder_hidden_states], axis=1)
        encoder_attention_mask = jnp.concatenate(
            [pre_mask, encoder_attention_mask], axis=1)

    # --- cross-attention adapter memory (reference 606-628) ---
    acoustic_mem = acoustic_pad = acoustic_conf = None
    if cfg.decoder_cross_attention:
        feat = cfg.decoder_cross_attention_feature
        if feat in ("mix", "raw"):
            acoustic_mem = mixed
            acoustic_pad = ~mask_x0
        elif feat == "sep":
            acoustic_mem = jnp.concatenate(sep_hidden, axis=1)
            acoustic_pad = ~align_mask_len(
                jnp.tile(mask_x0, (1, cfg.talker_numbers)),
                acoustic_mem.shape[1])  # reference 616-618
        elif feat == "ctctoken":
            acoustic_mem, acoustic_pad, acoustic_conf = ctc_token_builder(
                sep_hidden, mask_x0, _ctc_head_list(params, cfg),
                cfg.ctc_blank_id, max_tokens_per_spk=ctc_prompt_max_len)

    return EncodedSpeech(
        encoder_hidden_states=encoder_hidden_states,
        encoder_attention_mask=encoder_attention_mask,
        sep_hidden=sep_hidden, mask_x0=mask_x0,
        acoustic_mem=acoustic_mem, acoustic_pad_mask=acoustic_pad,
        acoustic_conf=acoustic_conf)


def encode_speech(
    params: dict, cfg: SpeechEncoderDecoderConfig,
    input_values: jax.Array, audio_mask: Optional[jax.Array],
    *,
    mask_time_indices: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    ctc_prompt_max_len: int = 64,
) -> EncodedSpeech:
    feats = encode_feats(params, cfg, input_values, audio_mask,
                         mask_time_indices=mask_time_indices,
                         deterministic=deterministic, rng=rng)
    return bridge_features(params, cfg, feats,
                           ctc_prompt_max_len=ctc_prompt_max_len)


def _adapter_callback(params: dict, cfg: SpeechEncoderDecoderConfig,
                      enc: EncodedSpeech):
    if not cfg.decoder_cross_attention or "cross_att_adap" not in params:
        return None

    def cb(layer_idx: int, hidden: jax.Array) -> jax.Array:
        return adapter_forward(
            params["cross_att_adap"][str(layer_idx)],
            cfg.decoder_cross_attention_type, hidden,
            enc.acoustic_mem, enc.acoustic_pad_mask, enc.acoustic_conf)
    return cb


# ---------------------------------------------------------------------------
# training / teacher-forced forward
# ---------------------------------------------------------------------------
def model_forward(
    params: dict,
    cfg: SpeechEncoderDecoderConfig,
    input_values: jax.Array,              # [B, S] waveform
    audio_mask: Optional[jax.Array],      # [B, S]
    decoder_input_ids: jax.Array,         # [B, L'] (shifted, pad-appended)
    *,
    splice_index: int = 1,                # static: 1 (non-instruct) / P+4
    ce_labels: Optional[jax.Array] = None,  # [B, L'] labels w/ eos inserted
    label_spks: Optional[jax.Array] = None,      # [K, B, Lk]
    label_spk_lens: Optional[jax.Array] = None,  # [K, B]
    mask_time_indices: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    use_pit: bool = False,
) -> ForwardOutput:
    enc = encode_speech(params, cfg, input_values, audio_mask,
                        mask_time_indices=mask_time_indices,
                        deterministic=deterministic, rng=rng)
    return model_forward_from_enc(
        params, cfg, enc, decoder_input_ids, splice_index=splice_index,
        ce_labels=ce_labels, label_spks=label_spks,
        label_spk_lens=label_spk_lens, rng=rng, use_pit=use_pit)


def model_forward_from_enc(
    params: dict,
    cfg: SpeechEncoderDecoderConfig,
    enc: EncodedSpeech,
    decoder_input_ids: jax.Array,
    *,
    splice_index: int = 1,
    ce_labels: Optional[jax.Array] = None,
    label_spks: Optional[jax.Array] = None,
    label_spk_lens: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    use_pit: bool = False,
) -> ForwardOutput:
    """Everything downstream of the encoder: decoder forward + losses.

    Split out of model_forward so PCGrad can linearize the encode trunk
    and this post-encode stage separately (train/train_step.py): the
    per-head CTC pullbacks then run through the trunk only, never
    touching the decoder graph (the reference's K extra autograd.grad
    calls traverse the whole retained graph, trainer_seq2seq.py:1106)."""
    speech = enc.encoder_hidden_states
    B, Ts = speech.shape[:2]
    L = decoder_input_ids.shape[1]

    emb = embed_tokens(params["decoder"], cfg.decoder, decoder_input_ids,
                       dtype=speech.dtype)
    inputs_embeds = jnp.concatenate(
        [emb[:, :splice_index], speech, emb[:, splice_index:]], axis=1)
    total = Ts + L
    position_ids = jnp.broadcast_to(jnp.arange(total)[None, :], (B, total))

    # decoder LoRA rides the forward activation-level (PEFT semantics) so the
    # adapters actually receive gradients; reference trains them via
    # model.add_adapter+enable_adapters (finetune_asr.py:127-134)
    lora = params.get("decoder_lora")
    lora_rng = None
    # rng is only passed in training (eval paths call with rng=None), so
    # its presence doubles as the deterministic flag here
    if lora is not None and rng is not None and cfg.lora_dropout > 0.0:
        lora_rng = jax.random.fold_in(rng, 0x10A)

    logits, _ = llama_forward(
        params["decoder"], cfg.decoder, inputs_embeds, position_ids,
        layer_callback=_adapter_callback(params, cfg, enc),
        lora=lora, lora_rng=lora_rng,
        lora_dropout=cfg.lora_dropout if lora is not None else 0.0)

    loss = None
    aux: Dict[str, jax.Array] = {}
    if ce_labels is not None or cfg.train_mode == "ctc":
        # in-graph label layout (reference 696-742)
        labels_full = None
        if ce_labels is not None:
            if cfg.instruct:
                prefix_len = Ts + splice_index + 1
                tail = ce_labels[:, splice_index + 1:]
            else:
                prefix_len = Ts
                tail = ce_labels
            ignore = jnp.full((B, prefix_len), cfg.ignore_token_id,
                              dtype=ce_labels.dtype)
            labels_full = jnp.concatenate([ignore, tail], axis=1)

        hlens = jnp.sum(enc.mask_x0.astype(jnp.int32), axis=1) \
            if enc.mask_x0 is not None else None
        loss, loss_aux = hybrid_loss(
            cfg.train_mode, cfg.ctc_alpha,
            logits=logits, labels=labels_full, ignore_id=cfg.ignore_token_id,
            ctc_params=_ctc_head_list(params, cfg) if cfg.talker_ctc else None,
            sep_hidden=enc.sep_hidden, hlens=hlens,
            label_spks=label_spks, label_spk_lens=label_spk_lens,
            blank_id=cfg.ctc_blank_id, use_pit=use_pit)
        aux.update(loss_aux)

    return ForwardOutput(loss=loss, logits=logits, aux=aux)


# ---------------------------------------------------------------------------
# one-shot CTC decode (reference forward_ctc, 833-900)
# ---------------------------------------------------------------------------
def forward_ctc(
    params: dict, cfg: SpeechEncoderDecoderConfig,
    input_values: jax.Array, audio_mask: Optional[jax.Array],
    max_out_len: int = 150,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (transcriptions [B, K*max_out_len], lengths [K, B]): per-head
    collapsed CTC argmax, concatenated across speakers."""
    enc = wavlm_forward(params["encoder"], cfg.encoder, input_values, audio_mask)
    mixed = enc.encoder_hidden_state
    B, T0 = mixed.shape[:2]
    mask_x0 = (feature_vector_attention_mask(cfg.encoder, T0, audio_mask,
                                             num_adapter_layers=0)
               if audio_mask is not None else jnp.ones((B, T0), jnp.bool_))
    sep_hidden = separator_forward(params["separator"], mixed,
                                   cfg.talker_numbers)
    heads = _ctc_head_list(params, cfg)
    outs, lens = [], []
    for i in range(cfg.talker_numbers):
        path = ctc_argmax(heads[i], sep_hidden[i])
        col, ln = ctc_greedy_collapse(path, mask_x0, cfg.ctc_blank_id,
                                      cfg.pad_token_id, max_out_len)
        outs.append(col)
        lens.append(ln)
    return jnp.concatenate(outs, axis=1), jnp.stack(lens)
