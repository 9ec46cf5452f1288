"""Sparse-slot CTC bridge: spike-picking -> top-k prune -> Gaussian pooling
-> slot positions -> cross-attention fusion.

Re-design of /root/reference/models/ctc_bridge_sparse_slot.py (experimental,
not imported by the reference's live model — provided for inventory
completeness). Every per-sample Python loop becomes a vectorized op:

* greedy spike picking with a min-distance constraint (reference
  find_spikes_from_A:45-68, per-(b,t) loops) -> lax.scan over time carrying
  the last-spike position per batch row
* top-k prune by local mean A (reference 71-96, nested loops) -> windowed
  mean via cumsum + masked top_k
* Gaussian spike pooling (reference spike_pool_gaussian_flex) -> one
  [S, T] weight matrix per batch row, one matmul
* slots padded to a static S_max (the reference's batch-adaptive length
  becomes bucketed + masked)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.models.layers import (
    layer_norm, layer_norm_init, linear, linear_init,
)
from mtasr_tpu.models.refiners import init_mha_params, mha


# ---------------------------------------------------------------------------
# spike machinery
# ---------------------------------------------------------------------------
def find_spikes(A: jax.Array, thresh: float = 0.6,
                min_dist: int = 4, max_spikes: int = 64
                ) -> Tuple[jax.Array, jax.Array]:
    """A: [B, T] non-blank posterior -> (spike positions [B, S_max] padded
    with -1, count [B]). Greedy left-to-right with a min-distance constraint
    and 3-point local-max check, exactly the reference policy."""
    B, T = A.shape
    left = jnp.pad(A, ((0, 0), (1, 0)), constant_values=-1.0)[:, :T]
    right = jnp.pad(A, ((0, 0), (0, 1)), constant_values=-1.0)[:, 1:]
    local_max = (A >= left) & (A >= right) & (A >= thresh)

    def step(last, inputs):
        lm_t, t = inputs
        take = lm_t & ((t - last) >= min_dist)
        last = jnp.where(take, t, last)
        return last, take

    ts = jnp.arange(T)
    _, taken = jax.lax.scan(
        step, jnp.full((B,), -min_dist - 1),
        (jnp.swapaxes(local_max, 0, 1), ts))
    taken = jnp.swapaxes(taken, 0, 1)                  # [B, T] bool

    # compact spike positions to the left, pad with -1
    order = jnp.argsort(jnp.where(taken, 0, 1), axis=1, stable=True)
    pos_sorted = jnp.where(
        jnp.take_along_axis(taken, order, axis=1), order, -1)
    count = jnp.sum(taken, axis=1)
    return pos_sorted[:, :max_spikes], jnp.minimum(count, max_spikes)


def prune_spikes_topk(A: jax.Array, spikes: jax.Array, k: int,
                      r: int = 8) -> jax.Array:
    """Keep the top-k spikes by local mean(A) in radius r. [B, S] -> [B, k]
    (padded -1)."""
    B, T = A.shape
    csum = jnp.pad(jnp.cumsum(A, axis=1), ((0, 0), (1, 0)))
    pos = jnp.clip(spikes, 0, T - 1)
    lo = jnp.clip(pos - r, 0, T)
    hi = jnp.clip(pos + r + 1, 0, T)
    local_mean = (jnp.take_along_axis(csum, hi, 1)
                  - jnp.take_along_axis(csum, lo, 1)) / jnp.maximum(hi - lo, 1)
    scores = jnp.where(spikes >= 0, local_mean, -1e9)
    k_eff = min(k, spikes.shape[1])
    top_scores, top_idx = jax.lax.top_k(scores, k_eff)
    out = jnp.take_along_axis(spikes, top_idx, 1)
    out = jnp.where(top_scores > -1e8, out, -1)
    if k_eff < k:
        out = jnp.pad(out, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return out


def spike_pool_gaussian(h: jax.Array, spikes: jax.Array,
                        r: int = 8, sigma: float = 4.0
                        ) -> Tuple[jax.Array, jax.Array]:
    """Gaussian pooling around each spike: h [B, T, D], spikes [B, S]
    -> (Z [B, S, D], valid [B, S])."""
    B, T, D = h.shape
    S = spikes.shape[1]
    t = jnp.arange(T)[None, None, :]
    c = spikes[:, :, None].astype(jnp.float32)
    w = jnp.exp(-0.5 * ((t - c) / sigma) ** 2)
    w = jnp.where(jnp.abs(t - c) <= r, w, 0.0)
    valid = spikes >= 0
    w = w * valid[:, :, None]
    w = w / jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1e-6)
    Z = jnp.einsum("bst,btd->bsd", w.astype(h.dtype), h)
    return Z, valid


# ---------------------------------------------------------------------------
# the bridge module
# ---------------------------------------------------------------------------
def init_sparse_slot_params(key: jax.Array, d_ctc: int, d_model: int,
                            max_slots: int = 64, n_heads: int = 8,
                            dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "proj_slot": linear_init(k1, d_ctc, d_model, dtype=dtype),
        "slot_pos": jax.random.normal(k2, (max_slots, d_model), dtype)
        * (d_model ** -0.5),
        "ln_slot": layer_norm_init(d_model, dtype),
        "fuse_attn": init_mha_params(k3, d_model, dtype),
        "ln_out": layer_norm_init(d_model, dtype),
        "out_mlp": linear_init(k4, d_model, d_model, dtype=dtype),
    }


def sparse_slot_bridge(
    p: dict,
    x_m: jax.Array,            # [B, Tm, d_model] mixed features (projected)
    h_ctc: jax.Array,          # [B, T_hi, d_ctc] CTC-rate features
    A: jax.Array,              # [B, T_hi] non-blank posterior
    *,
    n_heads: int = 8,
    thresh: float = 0.6,
    min_dist: int = 4,
    top_k: int = 32,
    radius: int = 8,
    sigma: float = 4.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (fused [B, Tm, d_model], slot_valid [B, top_k]): mixed
    features cross-attend to the pooled sparse acoustic slots."""
    max_slots = p["slot_pos"].shape[0]
    spikes, _ = find_spikes(A, thresh, min_dist, max_spikes=max_slots)
    spikes = prune_spikes_topk(A, spikes, k=min(top_k, max_slots),
                               r=radius)
    Z, valid = spike_pool_gaussian(h_ctc, spikes, r=radius, sigma=sigma)
    slots = linear(p["proj_slot"], Z)
    S = slots.shape[1]
    slots = slots + p["slot_pos"][:S][None].astype(slots.dtype)
    slots = layer_norm(p["ln_slot"], slots)

    attn_mask = valid[:, None, None, :]          # keep only valid slots
    y = mha(p["fuse_attn"], x_m, slots, n_heads, attn_mask)
    out = layer_norm(p["ln_out"], x_m + y)
    return out + linear(p["out_mlp"], out), valid
