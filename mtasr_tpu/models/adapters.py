"""Cross-attention adapter family injected per decoder layer.

Re-designs of:
  tiny        -- /root/reference/models/tiny_crossatt_module.py
  gatetiny    -- /root/reference/models/gate_tiny_crossatt_module.py
  ctcaware    -- /root/reference/models/ctcaware_crossatt_module.py
  adapgatetiny-- /root/reference/models/adap_gate_tiny_crossatt_module.py
                 (adaptive-rank LoRA on frozen q/k/v/out projections with
                  per-rank sigmoid gates, rank_usage budget metric, pruning)

All four share one low-rank single-head cross-attention core from decoder
hidden states to an acoustic memory; they differ in gating/confidence
refinement. Each is a pure function over a params dict; mem_mask follows the
reference convention True = padding (masked out).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.models.layers import layer_norm, layer_norm_init, linear, linear_init


def init_adapter_params(key: jax.Array, kind: str, hidden_size: int,
                        mem_dim: int, attn_dim: int = 512,
                        r_max: int = 16, lora_alpha: float = 16.0,
                        init_rank_logit: float = 2.0,
                        dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    p: dict = {
        "q_proj": linear_init(next(keys), hidden_size, attn_dim, dtype=dtype),
        "k_proj": linear_init(next(keys), mem_dim, attn_dim, dtype=dtype),
        "v_proj": linear_init(next(keys), mem_dim, attn_dim, dtype=dtype),
        "out_proj": linear_init(next(keys), attn_dim, hidden_size, dtype=dtype),
        "ln_in": layer_norm_init(hidden_size, dtype),
        "ln_out": layer_norm_init(hidden_size, dtype),
    }
    if kind in ("gatetiny", "adapgatetiny"):
        # sigmoid(-2) ~= 0.12: adapter barely perturbs early training
        p["gate_logit"] = jnp.asarray(-2.0, dtype)
    if kind == "ctcaware":
        p["conf_scale"] = jnp.asarray(1.0, dtype)
        p["cross_gate"] = jnp.asarray(1.0, dtype)
    if kind == "adapgatetiny":
        def _lora(key, in_dim, out_dim):
            akey, _ = jax.random.split(key)
            # kaiming_uniform(a=sqrt(5)) on [r, in]
            bound = jnp.sqrt(6.0 / ((1 + 5) / 2.0) / in_dim)
            return {
                "lora_A": jax.random.uniform(akey, (r_max, in_dim), dtype,
                                             -bound, bound),
                "lora_B": jnp.zeros((out_dim, r_max), dtype),
                "rank_logits": jnp.full((r_max,), init_rank_logit, dtype),
            }
        p["q_lora"] = _lora(next(keys), hidden_size, attn_dim)
        p["k_lora"] = _lora(next(keys), mem_dim, attn_dim)
        p["v_lora"] = _lora(next(keys), mem_dim, attn_dim)
        p["out_lora"] = _lora(next(keys), attn_dim, hidden_size)
        p["lora_alpha"] = jnp.asarray(lora_alpha, dtype)
        p["lora_scale"] = jnp.asarray(lora_alpha / max(1, r_max), dtype)
    return p


def _lora_delta(lp: dict, x: jax.Array, scale: jax.Array) -> jax.Array:
    xa = jnp.einsum("...i,ri->...r", x, lp["lora_A"].astype(x.dtype))
    xa = xa * jax.nn.sigmoid(lp["rank_logits"]).astype(x.dtype)
    return scale.astype(x.dtype) * jnp.einsum(
        "...r,or->...o", xa, lp["lora_B"].astype(x.dtype))


def _proj(p: dict, kind: str, name: str, x: jax.Array) -> jax.Array:
    y = linear(p[f"{name}_proj"], x)
    if kind == "adapgatetiny":
        y = y + _lora_delta(p[f"{name}_lora"], x, p["lora_scale"])
    return y


def adapter_forward(
    p: dict,
    kind: str,                            # tiny|gatetiny|ctcaware|adapgatetiny
    hidden: jax.Array,                    # [B, Lq, H]
    mem: Optional[jax.Array],             # [B, Tm, D]
    mem_mask: Optional[jax.Array] = None,  # [B, Tm] bool, True = PADDING
    mem_conf: Optional[jax.Array] = None,  # [B, Tm] in [0, 1]
) -> jax.Array:
    if mem is None:
        return hidden

    h_norm = layer_norm(p["ln_in"], hidden)
    q = _proj(p, kind, "q", h_norm)
    k = _proj(p, kind, "k", mem.astype(hidden.dtype))
    v = _proj(p, kind, "v", mem.astype(hidden.dtype))

    scores = jnp.einsum("bla,bta->blt", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(q.shape[-1]))
    if mem_mask is not None:
        scores = jnp.where(mem_mask[:, None, :], -1e30, scores)
    if kind == "ctcaware" and mem_conf is not None:
        conf = jnp.clip(mem_conf, 1e-6, None).astype(jnp.float32)
        scores = scores + p["conf_scale"] * jnp.log(conf)[:, None, :]

    weights = jax.nn.softmax(scores, axis=-1)
    if kind == "ctcaware" and mem_conf is not None:
        conf = jnp.clip(mem_conf, 1e-6, None).astype(weights.dtype)
        weights = weights * conf[:, None, :]
        weights = weights / (jnp.sum(weights, -1, keepdims=True) + 1e-6)
    weights = weights.astype(hidden.dtype)

    context = jnp.einsum("blt,bta->bla", weights, v)
    context_h = _proj(p, kind, "out", context)

    if kind == "tiny":
        return layer_norm(p["ln_out"], hidden + context_h)
    if kind == "ctcaware":
        return layer_norm(
            p["ln_out"], hidden + p["cross_gate"].astype(hidden.dtype) * context_h)
    # gated variants: out = hidden + g * (LN(hidden + ctx) - hidden)
    out_base = layer_norm(p["ln_out"], hidden + context_h)
    g = jax.nn.sigmoid(p["gate_logit"]).astype(hidden.dtype)
    return hidden + g * (out_base - hidden)


def rank_usage(p: dict) -> jax.Array:
    """Soft expected active ranks across all LoRA projections
    (adap_gate_tiny_crossatt_module.py:148-156)."""
    total = jnp.float32(0.0)
    for name in ("q_lora", "k_lora", "v_lora", "out_lora"):
        if name in p:
            total = total + jnp.sum(jax.nn.sigmoid(p[name]["rank_logits"]))
    return total


def prune_lora_ranks(p: dict, gate_threshold: float = 0.1,
                     keep_at_least: int = 1) -> Tuple[dict, int]:
    """Physically drop LoRA ranks with gate < threshold (host-side numpy op;
    adap_gate_tiny_crossatt_module.py:158-187). Returns (new params, new r)."""
    import numpy as np
    p = dict(p)
    new_r = None
    for name in ("q_lora", "k_lora", "v_lora", "out_lora"):
        if name not in p:
            continue
        lp = {k: np.asarray(v) for k, v in p[name].items()}
        g = 1.0 / (1.0 + np.exp(-lp["rank_logits"]))
        keep = np.nonzero(g >= gate_threshold)[0]
        if keep.size < keep_at_least:
            keep = np.sort(np.argsort(-g)[:keep_at_least])
        p[name] = {
            "lora_A": jnp.asarray(lp["lora_A"][keep]),
            "lora_B": jnp.asarray(lp["lora_B"][:, keep]),
            "rank_logits": jnp.asarray(lp["rank_logits"][keep]),
        }
        if name == "q_lora":
            new_r = keep.size
    if new_r is not None and "lora_alpha" in p:
        p["lora_scale"] = jnp.asarray(
            float(np.asarray(p["lora_alpha"])) / max(1, new_r),
            p["lora_scale"].dtype)
    return p, (new_r or 0)


# ---------------------------------------------------------------------------
# shared acoustic cross-attn core + per-layer MLP wrappers
# (crossatt_core_module.py — imported but never instantiated by the
# reference's live config switch; provided for completeness)
# ---------------------------------------------------------------------------
def init_shared_core_params(key: jax.Array, hidden_size: int, mem_dim: int,
                            attn_dim: int = 512, n_layers: int = 1,
                            mlp_rank: int = 256, use_pre_mlp: bool = True,
                            use_post_mlp: bool = False,
                            dtype=jnp.float32) -> dict:
    """One shared core (= a tiny adapter without gates) + per-layer small
    residual MLPs."""
    kc, *kl = jax.random.split(key, 1 + n_layers)
    p: dict = {"core": init_adapter_params(kc, "tiny", hidden_size, mem_dim,
                                           attn_dim, dtype=dtype),
               "wrappers": {}}
    for i, ki in enumerate(kl):
        k1, k2, k3, k4 = jax.random.split(ki, 4)
        w: dict = {}
        if use_pre_mlp:
            w["pre_mlp"] = {"0": linear_init(k1, hidden_size, mlp_rank,
                                             dtype=dtype),
                            "2": linear_init(k2, mlp_rank, hidden_size,
                                             dtype=dtype)}
        if use_post_mlp:
            w["post_mlp"] = {"0": linear_init(k3, hidden_size, mlp_rank,
                                              dtype=dtype),
                             "2": linear_init(k4, mlp_rank, hidden_size,
                                              dtype=dtype)}
        p["wrappers"][str(i)] = w
    return p


def shared_core_forward(p: dict, layer_idx: int, hidden: jax.Array,
                        mem: Optional[jax.Array],
                        mem_mask: Optional[jax.Array] = None) -> jax.Array:
    """PerLayerAcousticAdapterWrapper.forward: per-layer pre-MLP residual ->
    shared core cross-attn -> optional post-MLP residual."""
    if mem is None:
        return hidden
    w = p["wrappers"][str(layer_idx)]
    x = hidden
    if "pre_mlp" in w:
        x = x + linear(w["pre_mlp"]["2"],
                       jax.nn.silu(linear(w["pre_mlp"]["0"], x)))
    x = adapter_forward(p["core"], "tiny", x, mem, mem_mask)
    if "post_mlp" in w:
        x = x + linear(w["post_mlp"]["2"],
                       jax.nn.silu(linear(w["post_mlp"]["0"], x)))
    return x
