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


# ---------------------------------------------------------------------------
# Streaming quantized load: real checkpoints -> int8 serving on one chip
# ---------------------------------------------------------------------------

_DEC_QUANT_RE = None


def _decoder_quant_key(flat_key: str) -> bool:
    """Flat param names whose weights the serving quantizer targets — must
    mirror _quantize_decoder_impl + quantize_tree (utils/quantize.py): the
    per-layer q/k/v/o + mlp projections and lm_head."""
    global _DEC_QUANT_RE
    if _DEC_QUANT_RE is None:
        import re
        _DEC_QUANT_RE = re.compile(
            r"^decoder\.("
            r"model\.layers\.\d+\.(self_attn\.[qkvo]_proj"
            r"|mlp\.(gate|up|down)_proj)"
            r"|lm_head)\.weight$")
    return _DEC_QUANT_RE.match(flat_key) is not None


def _quantize_host(w: np.ndarray, mode: str) -> dict:
    """numpy mirror of quantize_linear (same f32 math: symmetric per-out-row
    scales, round-half-even) so only INT8 crosses the host->device link —
    the 8B load moves 8 GB instead of 16/32 GB."""
    w = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w).max(axis=1, keepdims=True), 127e-12) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    key = "weight_q8a8" if mode == "w8a8" else "weight_q8"
    return {key: wq, "scale": scale[:, 0]}


def load_model_quantized(
    path: str, mode: str = "w8a8", *,
    scope: str = "decoder",
    min_out_dim: int = 256,
    dtype=jnp.bfloat16,
    device: Optional[jax.Device] = None,
) -> Tuple[SpeechEncoderDecoderConfig, dict]:
    """Stream a real-format checkpoint dir (config.json + *.safetensors)
    into an int8 serving tree WITHOUT ever materializing the bf16 decoder —
    tensor-by-tensor: host read -> host quantize -> device put -> free.

    This is the pathway the reference's model_loader.py:26-51 (
    from_pretrained on real WavLM/LLaMA checkpoints) needs at 8B on one
    16 GB chip: 8B bf16 (16 GB) cannot co-reside with its int8 copy, so
    load-then-quantize OOMs; streaming keeps peak HBM ~= the final serving
    footprint (+ one tensor). Parity with quantize_decoder_for_serving is
    pinned in tests/test_streaming_load.py.

    Non-quantized float leaves are cast to `dtype` (serving dtype) on
    host. LoRA checkpoints must be merged first (cli tools merge-lora):
    streaming cannot fold adapters tensor-by-tensor.
    """
    assert mode in ("w8", "w8a8") and scope in ("decoder", "all")
    from safetensors import safe_open

    with open(os.path.join(path, "config.json")) as f:
        cfg = SpeechEncoderDecoderConfig.from_json(f.read())
    cfg.validate()
    if device is None:
        device = jax.devices()[0]

    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors in {path}")

    flat: dict = {}
    saw_lm_head = False
    embed_np = None
    for fn in files:
        with safe_open(os.path.join(path, fn), framework="numpy") as sf:
            for name in sf.keys():
                if ".decoder_lora." in name or name.startswith("decoder_lora."):
                    raise ValueError(
                        "streaming quantized load cannot fold LoRA; merge "
                        "first (mtasr_tpu.cli.tools merge-lora)")
                arr = sf.get_tensor(name)
                if _decoder_quant_key(name) and arr.ndim == 2 \
                        and arr.shape[0] >= min_out_dim:
                    base = name[: -len(".weight")]
                    q = _quantize_host(arr, mode)
                    for k, v in q.items():
                        flat[f"{base}.{k}"] = jax.device_put(v, device)
                    saw_lm_head |= base.endswith("lm_head")
                    del arr, q
                    continue
                if name == "decoder.model.embed_tokens.weight":
                    embed_np = np.asarray(arr, np.float32)
                if np.issubdtype(arr.dtype, np.floating):
                    arr = arr.astype(dtype)
                flat[name] = jax.device_put(arr, device)
                del arr
    if not saw_lm_head and embed_np is not None:
        # tied embeddings: materialize a quantized head (mirrors
        # _quantize_decoder_impl's tied branch)
        q = _quantize_host(embed_np, mode)
        for k, v in q.items():
            flat[f"decoder.lm_head.{k}"] = jax.device_put(v, device)
        del embed_np
    from mtasr_tpu.utils.torch_interop import flat_to_tree
    params = flat_to_tree(flat)
    if scope == "all":
        # encoder is small (~300M); quantize on device, no host roundtrip
        from mtasr_tpu.utils.quantize import quantize_encoder_for_serving
        params = quantize_encoder_for_serving(params, mode)
    return cfg, params
