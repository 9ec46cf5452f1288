"""Device mesh + sharding rules: the TPU-native replacement for the
reference's NCCL/DDP/Accelerate distribution (SURVEY.md §2.3).

One mesh with axes ('data', 'model'):
* data  -- batch sharding (DDP equivalent; reference run.sh:193-194 spawns
           1 process/GPU with gradient all-reduce, here XLA emits psums
           over ICI from sharding constraints)
* model -- tensor parallelism for the LLaMA decoder + WavLM encoder
           (the reference only *declares* TP: _tp_plan at
           modeling_llama.py:472 is never exercised; here it is real and
           required for 8B on small TPU slices)

Params are assigned PartitionSpecs by regex rules over their tree path —
the t5x-style approach; no module-level annotations needed since params are
plain dicts.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp_size: int = -1, tp_size: int = 1,
              devices: Optional[list] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp_size == -1:
        dp_size = n // tp_size
    assert dp_size * tp_size == n, f"{dp_size}x{tp_size} != {n} devices"
    arr = np.asarray(devices).reshape(dp_size, tp_size)
    return Mesh(arr, axis_names=("data", "model"))


# (path regex, PartitionSpec) — first match wins. Paths are '/'-joined key
# chains, e.g. 'decoder/model/layers/0/self_attn/q_proj/weight'.
# Weights are in torch layout [out, in]; 'model'-axis sharding puts the
# matmul contraction or output dim on the TP axis so XLA inserts
# reduce-scatter/all-gather over ICI.
DEFAULT_RULES: List[Tuple[str, P]] = [
    # ---- LLaMA decoder TP ----
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/weight$", P("model", None)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/bias$", P("model")),
    (r".*(o_proj|down_proj)/weight$", P(None, "model")),
    (r".*embed_tokens/weight$", P("model", None)),
    (r".*lm_head/weight$", P("model", None)),
    # ---- WavLM encoder TP ----
    (r".*attention/(out_proj)/weight$", P(None, "model")),
    (r".*attention/(q|k|v)_proj/weight$", P("model", None)),
    (r".*attention/(q|k|v)_proj/bias$", P("model")),
    (r".*feed_forward/intermediate_dense/weight$", P("model", None)),
    (r".*feed_forward/intermediate_dense/bias$", P("model")),
    (r".*feed_forward/output_dense/weight$", P(None, "model")),
    # ---- CTC heads: vocab-sized projection benefits from TP ----
    (r".*ctc_lo/weight$", P("model", None)),
    (r".*ctc_lo/bias$", P("model")),
    # ---- everything else replicated ----
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_s: str, rules=None) -> P:
    for pattern, spec in (rules or DEFAULT_RULES):
        if re.match(pattern, path_s):
            return spec
    return P()


def partition_spec_for_tree(tree, rules=None):
    """Returns a tree of PartitionSpecs matching `tree`'s structure.
    A spec whose sharded dim does not divide the actual array dim falls back
    to replication (e.g. tiny test models on 8-way meshes)."""
    def assign(path, leaf):
        spec = spec_for_path(_path_str(path), rules)
        if any(ax is not None for ax in spec):
            for dim, ax in enumerate(spec):
                if ax is not None and dim < leaf.ndim:
                    # divisibility checked at shard time; keep spec here
                    pass
        return spec
    return jax.tree_util.tree_map_with_path(assign, tree)


def shard_params(params, mesh: Mesh, rules=None):
    """device_put every param with its NamedSharding; falls back to
    replication when the sharded dim isn't divisible by the mesh axis."""
    def put(path, leaf):
        spec = spec_for_path(_path_str(path), rules)
        for dim, ax in enumerate(spec):
            if ax is not None:
                if dim >= leaf.ndim or leaf.shape[dim] % mesh.shape[ax] != 0:
                    spec = P()
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Shard a training/eval batch over the 'data' axis.

    Key-aware: `label_spks`/`label_spk_lens` are [K, B, ...] (speaker-major,
    data/labels.py), so their *second* dim is the batch. Arrays whose batch
    dim is not divisible by the data-axis size fall back to replication
    (e.g. a short final eval batch) rather than erroring.
    """
    dp = mesh.shape["data"]

    def put(key_path, a):
        name = _path_str(key_path)
        spec = (P(None, "data") if name.startswith("label_spk") else P("data"))
        bdim = 1 if name.startswith("label_spk") else 0
        if a.ndim <= bdim or a.shape[bdim] % dp != 0:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, batch)
