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


def quantize_encoder_for_serving(params: dict, mode: str = "w8a8") -> dict:
    """Quantize the WavLM encoder transformer linears (q/k/v/out proj +
    FFN intermediate/output denses, feature projection) for serving.

    Unlike the decode loop (weight-bound), the B=128 encoder is
    COMPUTE-bound (proj+MLP ~65% MFU bf16, DESIGN.md round-3 profile), so
    the win here is the MXU's 2x int8 throughput, which needs mode='w8a8'
    (s8 x s8 -> s32 dots); 'w8' only halves weight bytes, which the
    encoder doesn't care about at large batch. Left in bf16: layer norms,
    the tiny gru_rel_pos gate (8-out), rel_attn_embed, the grouped
    pos-conv, the conv frontend, and the adapter convs.

    Structure is uniform across layers (quantized slots get the same
    {'weight_q8a8','scale','bias'} keys everywhere), so the scan_layers
    stacked-tree path is unaffected."""
    assert mode in ("w8", "w8a8"), mode
    return jax.jit(functools.partial(_quantize_encoder_impl, mode=mode))(
        params)


def _quantize_encoder_impl(params: dict, mode: str) -> dict:
    out = dict(params)
    enc = {k: v for k, v in params["encoder"].items()}
    tenc = dict(enc["encoder"])
    layers = {}
    for li, layer in tenc["layers"].items():
        att = dict(layer["attention"])
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            # per-slot (not whole-layer quantize_tree): rel_attn_embed is a
            # 2D [num_buckets, H] table consumed by take(), and the norms /
            # gru_rel_pos gate must stay bf16
            att[name] = quantize_tree(att[name], mode=mode)
        layers[li] = {
            **layer,
            "attention": att,
            "feed_forward": quantize_tree(layer["feed_forward"], mode=mode),
        }
    tenc["layers"] = layers
    enc["encoder"] = tenc
    if "feature_projection" in enc:
        fp = dict(enc["feature_projection"])
        fp["projection"] = quantize_tree(fp["projection"], mode=mode)
        enc["feature_projection"] = fp
    out["encoder"] = enc
    return out


def quantize_for_serving(params: dict, mode: str = "w8",
                         scope: str = "decoder") -> dict:
    """scope='decoder' (the weight-bound decode loop only) or 'all'
    (decoder + encoder transformer, for max-throughput int8 serving)."""
    assert scope in ("decoder", "all"), scope
    params = quantize_decoder_for_serving(params, mode)
    if scope == "all":
        params = quantize_encoder_for_serving(params, mode)
    return params


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


def init_quantized_llama_params(key, cfg, mode: str = "w8a8") -> dict:
    """Random-init a LLaMA decoder DIRECTLY in int8 serving form.

    For benchmarking/serving-scale bring-up of geometries whose bf16
    weights cannot co-reside with their int8 copy on one chip (LLaMA-8B:
    16 GB bf16 + 8 GB int8 > the 16 GB v5e HBM — the
    init-bf16-then-quantize path OOMs before the first decode step).
    Produces the same tree shape as `_quantize_decoder_impl` on an
    `init_llama_params` decoder: quantized q/k/v/o + mlp + lm_head
    ({weight_q8a8/weight_q8, scale}), bf16 embed/layernorms. Weight
    values are uniform int8 with per-channel scales chosen so the
    dequantized std ~= 0.02, matching `init_llama_params`' N(0, 0.02).
    Real checkpoints should use `quantize_decoder_for_serving`."""
    from mtasr_tpu.models.layers import embedding_init

    wkey = "weight_q8a8" if mode == "w8a8" else "weight_q8"
    keys = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
    H, D = cfg.hidden_size, cfg.head_dim_
    # uniform int8 in [-127, 127] has std ~73.3; scale for std 0.02
    scale_val = 0.02 / 73.3

    def qlin(k, in_dim, out_dim):
        wq = jax.random.randint(k, (out_dim, in_dim), -127, 128, jnp.int32
                                ).astype(jnp.int8)
        return {wkey: wq,
                "scale": jnp.full((out_dim,), scale_val, jnp.float32)}

    p = {"model": {
        "embed_tokens": embedding_init(next(keys), cfg.vocab_size, H,
                                       0.02, jnp.bfloat16),
        "layers": {},
        "norm": {"weight": jnp.ones((H,), jnp.bfloat16)},
    }}
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    for i in range(cfg.num_hidden_layers):
        p["model"]["layers"][str(i)] = {
            "self_attn": {
                "q_proj": qlin(next(keys), H, Hq * D),
                "k_proj": qlin(next(keys), H, Hkv * D),
                "v_proj": qlin(next(keys), H, Hkv * D),
                "o_proj": qlin(next(keys), Hq * D, H),
            },
            "mlp": {
                "gate_proj": qlin(next(keys), H, cfg.intermediate_size),
                "up_proj": qlin(next(keys), H, cfg.intermediate_size),
                "down_proj": qlin(next(keys), cfg.intermediate_size, H),
            },
            "input_layernorm": {"weight": jnp.ones((H,), jnp.bfloat16)},
            "post_attention_layernorm": {"weight": jnp.ones((H,),
                                                            jnp.bfloat16)},
        }
    p["lm_head"] = qlin(next(keys), H, cfg.vocab_size)
    return p
