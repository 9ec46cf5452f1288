"""HF/torch checkpoint <-> JAX param-tree interop.

The reference ships/consumes HF safetensors checkpoints
(utils/fix_safetensors_metadata.py, utils/merge_adapter.py,
encoder_extract.py). Our param trees mirror the HF state_dict key layout and
keep torch weight conventions, so conversion is a pure key-split tree build
plus a handful of structural fixups (weight-normed pos conv, squeezed
constants). Works from either a torch state_dict or a safetensors file —
no torch required at inference time.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def flat_to_tree(flat: Mapping[str, np.ndarray]) -> dict:
    """'a.b.c' -> tree['a']['b']['c']."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def tree_to_flat(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(tree_to_flat(v, name))
        else:
            flat[name] = np.asarray(v)
    return flat


def _fuse_weight_norm(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fuse torch weight_norm (pos conv) into a plain conv weight.
    Handles both old (`weight_g`/`weight_v`) and new
    (`parametrizations.weight.original0/1`) key layouts. dim=2 norm: the
    magnitude is per-kernel-position, direction normalized over (out, in)."""
    out: Dict[str, np.ndarray] = {}
    done = set()
    for key in list(flat.keys()):
        if key.endswith("parametrizations.weight.original0"):
            base = key[: -len("parametrizations.weight.original0") - 1]
            g = flat[key]
            v = flat[base + ".parametrizations.weight.original1"]
        elif key.endswith("weight_g"):
            base = key[: -len("weight_g") - 1]
            g = flat[key]
            v = flat[base + ".weight_v"]
        else:
            continue
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        out[base + ".weight"] = (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)
        done.add(key)
        done.add(base + (".parametrizations.weight.original1"
                         if "parametrizations" in key else ".weight_v"))
    for key, value in flat.items():
        if key not in done:
            out[key] = value
    return out


def _keep_weight_norm(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Keep torch weight_norm as separate (g, v) leaves, normalizing the new
    parametrizations.* key layout onto `weight_g`/`weight_v` (the layout our
    wavlm forward dispatches on). Used when training must reproduce the
    reference's per-(g, v) Adam dynamics — Adam is not parametrization-
    invariant, so fusing changes the pos_conv update trajectory."""
    out: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        if key.endswith("parametrizations.weight.original0"):
            base = key[: -len("parametrizations.weight.original0") - 1]
            out[base + ".weight_g"] = value
        elif key.endswith("parametrizations.weight.original1"):
            base = key[: -len("parametrizations.weight.original1") - 1]
            out[base + ".weight_v"] = value
        else:
            out[key] = value
    return out


def convert_torch_state_dict(state_dict, fuse_weight_norm: bool = True) -> dict:
    """Generic HF state_dict -> param tree (keeps torch weight layouts).

    fuse_weight_norm=False keeps weight-normed convs (the WavLM pos_conv) as
    separate weight_g/weight_v parameters for training-dynamics parity with
    the reference (HF trains g and v as distinct Adam slots)."""
    flat = {k: _to_numpy(v) for k, v in state_dict.items()}
    flat = (_fuse_weight_norm(flat) if fuse_weight_norm
            else _keep_weight_norm(flat))
    fixed: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        if key.endswith("gru_rel_pos_const"):
            value = value.reshape(-1)  # [1, H, 1, 1] -> [H]
        fixed[key] = value
    return flat_to_tree(fixed)


def load_safetensors_tree(path: str) -> dict:
    from safetensors.numpy import load_file
    return convert_torch_state_dict(load_file(path))


def save_safetensors_tree(tree: dict, path: str) -> None:
    """Export with metadata format=pt so HF from_pretrained accepts it
    (reference: utils/fix_safetensors_metadata.py:10-52)."""
    from safetensors.numpy import save_file
    flat = {k: np.ascontiguousarray(v) for k, v in tree_to_flat(tree).items()}
    save_file(flat, path, metadata={"format": "pt"})
