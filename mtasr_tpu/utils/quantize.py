"""Weight-only int8 quantization for serving.

The decode loop is weight-streaming-bound (DESIGN.md: 6.2 ms/step vs a
~3.1 ms bf16 weight-read bound). Storing the decoder's linear weights as
int8 with per-output-channel scales halves the bytes streamed per token;
the dequantize folds into the matmul (XLA fuses convert+scale into the dot
operand). Symmetric per-row quantization:

    w_int8[o, i] = round(w[o, i] / s[o]),  s[o] = max_i |w[o, i]| / 127

Quantized linears live in the same tree slot as {'weight','bias'} but with
{'weight_q8','scale','bias'} — `models.layers.linear` dispatches on the
keys, so every model runs unchanged on a quantized tree.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def quantize_linear(p: dict, mode: str = "w8") -> dict:
    """mode='w8': weight-only (dequant-to-bf16 in the dot operand).
    mode='w8a8': true int8 matmul — activations quantized per token at run
    time, s8 x s8 -> s32 on the MXU (models/layers.py::linear dispatch).

    Pure jnp so the whole-tree quantization traces into ONE device
    program: the original numpy version fetched every weight to host and
    re-uploaded it, which on the tunneled TPU runtime moved ~3.7 GB
    through a ~30 ms-latency link and took >40 min for the 1B decoder
    (the round-3 bench int8-extra timeout); on-device it is one compile
    + milliseconds."""
    w = p["weight"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1, keepdims=True),
                        127e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    key = "weight_q8a8" if mode == "w8a8" else "weight_q8"
    out = {key: wq, "scale": scale[:, 0]}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _is_linear(node) -> bool:
    return isinstance(node, dict) and "weight" in node and \
        not isinstance(node["weight"], dict) and node["weight"].ndim == 2


def quantize_tree(tree, min_out_dim: int = 256, mode: str = "w8"):
    """Quantize every 2D linear weight with out_dim >= min_out_dim (skips
    tiny glue layers where int8 error isn't worth it)."""
    if _is_linear(tree) and tree["weight"].shape[0] >= min_out_dim:
        return quantize_linear(tree, mode)
    if isinstance(tree, dict):
        return {k: quantize_tree(v, min_out_dim, mode) for k, v in tree.items()}
    return tree


def quantize_decoder_for_serving(params: dict, mode: str = "w8") -> dict:
    """Quantize the LLaMA decoder linears (q/k/v/o, MLP, lm_head) +
    embedding table stays bf16 (gather-only). Runs as one jitted device
    program (see quantize_linear)."""
    assert mode in ("w8", "w8a8"), mode
    return jax.jit(functools.partial(_quantize_decoder_impl, mode=mode))(
        params)


def _quantize_decoder_impl(params: dict, mode: str) -> dict:
    out = dict(params)
    dec = {k: v for k, v in params["decoder"].items()}
    model = dict(dec["model"])
    layers = {}
    for li, layer in model["layers"].items():
        layers[li] = {
            "self_attn": quantize_tree(layer["self_attn"], mode=mode),
            "mlp": quantize_tree(layer["mlp"], mode=mode),
            "input_layernorm": layer["input_layernorm"],
            "post_attention_layernorm": layer["post_attention_layernorm"],
        }
    model["layers"] = layers
    dec["model"] = model
    if "lm_head" in dec:
        dec["lm_head"] = quantize_tree(dec["lm_head"], mode=mode)
    else:
        # tied embeddings: materialize a quantized head so the per-token
        # logits matmul streams int8 instead of the bf16 embedding table
        dec["lm_head"] = quantize_linear(
            {"weight": model["embed_tokens"]["weight"]}, mode)
    out["decoder"] = dec
    return out
