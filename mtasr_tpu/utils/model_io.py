"""Composite-model directory format: config.json + model.safetensors.

Mirrors the reference's save_pretrained layout (config + safetensors with
metadata format=pt, utils/fix_safetensors_metadata.py) so checkpoints remain
interoperable with HF tooling; also the assembly path from separate
pretrained encoder/decoder dirs (utils/create_from_pretrained.py:184-301).
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtasr_tpu.config import (
    LlamaConfig, SpeechEncoderDecoderConfig, WavLMConfig,
)
from mtasr_tpu.utils.torch_interop import (
    convert_torch_state_dict, load_safetensors_tree, save_safetensors_tree,
    tree_to_flat,
)


def save_model(path: str, cfg: SpeechEncoderDecoderConfig, params: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())
    save_safetensors_tree(params, os.path.join(path, "model.safetensors"))


def load_model(path: str) -> Tuple[SpeechEncoderDecoderConfig, dict]:
    with open(os.path.join(path, "config.json")) as f:
        cfg = SpeechEncoderDecoderConfig.from_json(f.read())
    cfg.validate()
    params = load_safetensors_tree(os.path.join(path, "model.safetensors"))
    return cfg, params


def _hf_config_to_wavlm(d: dict) -> WavLMConfig:
    keys = {f.name for f in __import__("dataclasses").fields(WavLMConfig)}
    kw = {k: (tuple(v) if isinstance(v, list) else v)
          for k, v in d.items() if k in keys}
    return WavLMConfig(**kw)


def _hf_config_to_llama(d: dict) -> LlamaConfig:
    keys = {f.name for f in __import__("dataclasses").fields(LlamaConfig)}
    kw = {k: v for k, v in d.items() if k in keys}
    if isinstance(kw.get("eos_token_id"), list):
        kw["eos_token_id"] = kw["eos_token_id"][0]
    return LlamaConfig(**kw)


def load_hf_pretrained_dir(path: str) -> Tuple[dict, dict]:
    """Load an HF model dir (config.json + *.safetensors) into
    (config_dict, param_tree). No network access."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    flat = {}
    from safetensors.numpy import load_file
    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if not files:
        raise FileNotFoundError(f"no safetensors in {path}")
    for fn in sorted(files):
        flat.update(load_file(os.path.join(path, fn)))
    return cfg, convert_torch_state_dict(flat)


def create_from_pretrained(
    encoder_dir: str, decoder_dir: str,
    *,
    tokenizer_len: int,
    special_ids: dict,
    model_overrides: Optional[dict] = None,
    seed: int = 0,
) -> Tuple[SpeechEncoderDecoderConfig, dict]:
    """Assemble WavLM+LLaMA composite from pretrained parts
    (create_from_pretrained.py:184-301): load both, apply the reference's
    config surgery (encoder adapter on, mask_time_prob=.1, layerdrop=0,
    max_length=200), resize decoder embeddings to the grown tokenizer, init
    the fresh glue modules (proj/separator/ctc/adapters) per flags."""
    from mtasr_tpu.models.speech_encoder_decoder import init_model_params

    enc_cfg_d, enc_params = load_hf_pretrained_dir(encoder_dir)
    dec_cfg_d, dec_params = load_hf_pretrained_dir(decoder_dir)

    enc_cfg = _hf_config_to_wavlm(enc_cfg_d)
    enc_cfg.add_adapter = True
    enc_cfg.mask_time_prob = 0.1
    enc_cfg.layerdrop = 0.0
    dec_cfg = _hf_config_to_llama(dec_cfg_d)

    overrides = dict(model_overrides or {})
    cfg = SpeechEncoderDecoderConfig(encoder=enc_cfg, decoder=dec_cfg,
                                     **overrides)
    cfg.decoder_start_token_id = dec_cfg.bos_token_id
    cfg.bos_token_id = dec_cfg.bos_token_id
    cfg.eos_token_id = dec_cfg.eos_token_id
    for k, v in special_ids.items():
        setattr(cfg, k, v)
    cfg.max_length = 200

    # resize decoder embeddings (+lm_head) to tokenizer_len
    old_v = dec_cfg.vocab_size
    if tokenizer_len != old_v:
        dec_cfg.vocab_size = tokenizer_len
        emb = np.asarray(dec_params["model"]["embed_tokens"]["weight"])
        mean = emb.mean(axis=0, keepdims=True)
        grown = np.concatenate(
            [emb, np.repeat(mean, tokenizer_len - old_v, axis=0)], axis=0)
        dec_params["model"]["embed_tokens"]["weight"] = jnp.asarray(grown)
        if "lm_head" in dec_params:
            lm = np.asarray(dec_params["lm_head"]["weight"])
            lm_mean = lm.mean(axis=0, keepdims=True)
            dec_params["lm_head"]["weight"] = jnp.asarray(np.concatenate(
                [lm, np.repeat(lm_mean, tokenizer_len - old_v, axis=0)], axis=0))

    params = init_model_params(jax.random.key(seed), cfg)
    # graft pretrained weights over the fresh init (adapter stays fresh if
    # the pretrained encoder had none)
    params["decoder"] = _graft(params["decoder"], dec_params)
    params["encoder"] = _graft(params["encoder"], enc_params)
    return cfg, params


def _graft(dst, src):
    if isinstance(dst, dict) and isinstance(src, dict):
        out = dict(dst)
        for k, v in src.items():
            if k in dst:
                out[k] = _graft(dst[k], v)
        return out
    if hasattr(src, "shape") and hasattr(dst, "shape") and \
            tuple(src.shape) == tuple(dst.shape):
        return src
    return dst
