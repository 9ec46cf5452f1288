"""Decoder LoRA: insertion, runtime application, and offline merge.

Reference equivalents:
* insertion on q/k/v/o projections, r=16, alpha=32, dropout .1
  (/root/reference/src/insert_adapter_decoder.py:30-73, PEFT-backed)
* offline merge W += (alpha/r) B @ A over safetensors
  (/root/reference/utils/merge_adapter.py:15-82)

Here LoRA params live in a parallel subtree params['decoder_lora'] keyed by
layer and proj name. Two application modes:

* training: activation-level, inside the decoder attention
  (models/llama.py::_lora_linear) — y += (alpha/r) * B(A(dropout(x))),
  exactly PEFT's LoRA layer semantics incl. branch-input dropout, so
  gradients flow to lora_A/lora_B while base weights stay frozen;
* inference/merge: weight-level fold W' = W + (alpha/r) * B @ A
  (apply_decoder_lora / merge_decoder_lora), identical to the activation
  path when dropout is off.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def init_decoder_lora(key: jax.Array, decoder_params: dict,
                      target_modules: Sequence[str] = ("q_proj", "k_proj",
                                                       "v_proj", "o_proj"),
                      r: int = 16, alpha: float = 32.0,
                      layers: Optional[Sequence[int]] = None,
                      dtype=jnp.float32) -> dict:
    # meta kept in f32: int leaves would break jax.grad over the param tree
    lora: dict = {"__meta__": {"r": jnp.asarray(float(r), jnp.float32),
                               "alpha": jnp.asarray(float(alpha), jnp.float32)}}
    layer_tree = decoder_params["model"]["layers"]
    for li, layer in layer_tree.items():
        if layers is not None and int(li) not in layers:
            continue
        for proj in target_modules:
            w = layer["self_attn"][proj]["weight"]  # [out, in]
            out_dim, in_dim = w.shape
            key, ka = jax.random.split(key)
            bound = jnp.sqrt(6.0 / ((1 + 5) / 2.0) / in_dim)
            lora.setdefault(li, {})[proj] = {
                "lora_A": jax.random.uniform(ka, (r, in_dim), dtype,
                                             -bound, bound),
                "lora_B": jnp.zeros((out_dim, r), dtype),
            }
    return lora


def apply_decoder_lora(decoder_params: dict, lora: dict) -> dict:
    """Returns a decoder param tree with W' = W + (alpha/r) B @ A."""
    meta = lora["__meta__"]
    scale = meta["alpha"].astype(jnp.float32) / jnp.maximum(
        meta["r"].astype(jnp.float32), 1.0)
    out = jax.tree_util.tree_map(lambda x: x, decoder_params)  # shallow copy
    layers = dict(out["model"]["layers"])
    for li, projs in lora.items():
        if li == "__meta__":
            continue
        layer = dict(layers[li])
        attn = dict(layer["self_attn"])
        for proj, ab in projs.items():
            entry = dict(attn[proj])
            w = entry["weight"]
            delta = (ab["lora_B"].astype(jnp.float32)
                     @ ab["lora_A"].astype(jnp.float32)) * scale
            entry["weight"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
            attn[proj] = entry
        layer["self_attn"] = attn
        layers[li] = layer
    out["model"] = dict(out["model"])
    out["model"]["layers"] = layers
    return out


def merge_decoder_lora(params: dict) -> dict:
    """Offline merge (merge_adapter.py semantics): fold params['decoder_lora']
    into params['decoder'] and drop the adapter subtree."""
    if "decoder_lora" not in params:
        return params
    out = dict(params)
    out["decoder"] = apply_decoder_lora(params["decoder"],
                                        params["decoder_lora"])
    del out["decoder_lora"]
    return out
