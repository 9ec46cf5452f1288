"""CTC-guided bridge modules between the encoder stack and the LLaMA decoder.

Re-designs of:
  CTCAwareFrameRefiner      -- /root/reference/models/serilized_feature_refine.py
  MultiSpkCTCTokenBuilder   -- /root/reference/models/mt_ctctoken_builder.py
                               (per-sample/per-frame Python loops become
                                segment_sum pooling over run-length segment ids)
  build_multi_ctc_prefix    -- /root/reference/models/ctc_prompt.py
                               (dynamic per-sample concat becomes a static
                                [B, K*Lmax] layout with left-compaction)

The `raw` ctc_bridge (concat separated streams through the adapter) lives in
the composite model; `softmax` (CTCPerSpeakerExtractorConcatSoftmax) is in
refiners.py.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.models.ctc_head import ctc_log_softmax
from mtasr_tpu.models.layers import layer_norm, layer_norm_init, linear, linear_init


# ---------------------------------------------------------------------------
# CTC-aware frame refiner (talker_ctc_refine=true path)
# ---------------------------------------------------------------------------
def init_frame_refiner_params(key: jax.Array, d_model: int,
                              hidden_factor: int = 2, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    h = d_model * hidden_factor
    return {
        "mlp": {"0": linear_init(k1, d_model * 2 + 1, h, dtype=dtype),
                "2": linear_init(k2, h, d_model + 1, dtype=dtype)},
        "ln_sep": layer_norm_init(d_model, dtype),
        "ln_mixed": layer_norm_init(d_model, dtype),
    }


def frame_refiner_forward(
    p: dict,
    sep_hidden_list: Sequence[jax.Array],   # K x [B, T, D]
    mixed_hidden: jax.Array,                # [B, T, D]
    enc_mask: Optional[jax.Array],          # [B, T] True=valid
    ctc_params: Sequence[dict],
    blank_id: int,
) -> List[jax.Array]:
    D = mixed_hidden.shape[-1]
    mixed_norm = layer_norm(p["ln_mixed"], mixed_hidden)
    refined = []
    for k, sep_hidden in enumerate(sep_hidden_list):
        sep_norm = layer_norm(p["ln_sep"], sep_hidden)
        log_probs = jax.lax.stop_gradient(
            ctc_log_softmax(ctc_params[k], sep_hidden))
        p_nonblank = (1.0 - jnp.exp(log_probs[..., blank_id]))[..., None]
        p_nonblank = p_nonblank.astype(sep_hidden.dtype)
        feat = jnp.concatenate([sep_norm, mixed_norm, p_nonblank], axis=-1)
        out = linear(p["mlp"]["2"], jax.nn.relu(linear(p["mlp"]["0"], feat)))
        delta, gate_logit = out[..., :D], out[..., D:]
        gate = jax.nn.sigmoid(gate_logit)
        gate = gate * p_nonblank + 0.1 * (1.0 - p_nonblank)
        fused = sep_hidden + gate * (mixed_hidden - sep_hidden) + delta
        if enc_mask is not None:
            m = enc_mask[:, :, None]
            fused = jnp.where(m, fused, sep_hidden)
        refined.append(fused)
    return refined


# ---------------------------------------------------------------------------
# token-level acoustic memory from CTC argmax segments (ctcaware adapters)
# ---------------------------------------------------------------------------
def _segment_ids(path: jax.Array, valid: jax.Array, blank_id: int) -> jax.Array:
    """[B, T] run ids over non-blank runs (blank/invalid -> -1). A new run
    starts at a non-blank frame whose predecessor is blank/invalid or a
    different token (mt_ctctoken_builder.py:96-123 semantics)."""
    nonblank = valid & (path != blank_id)
    prev_path = jnp.pad(path, ((0, 0), (1, 0)))[:, :-1]
    prev_nonblank = jnp.pad(nonblank, ((0, 0), (1, 0)))[:, :-1]
    boundary = nonblank & (~prev_nonblank | (path != prev_path))
    seg = jnp.cumsum(boundary, axis=1) - 1
    return jnp.where(nonblank, seg, -1)


def ctc_token_builder(
    sep_hidden_list: Sequence[jax.Array],   # K x [B, T, D]
    enc_mask: jax.Array,                    # [B, T] True=valid
    ctc_params: Sequence[dict],
    blank_id: int,
    max_tokens_per_spk: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (mem [B, K*Lmax, D], mask [B, K*Lmax] True=PADDING,
    conf [B, K*Lmax]). Segment features are mean-pooled sep_hidden frames;
    conf = 1 - mean p_blank over the segment."""
    mems, masks, confs = [], [], []
    Lmax = max_tokens_per_spk
    for k, sep in enumerate(sep_hidden_list):
        B, T, D = sep.shape
        log_probs = jax.lax.stop_gradient(ctc_log_softmax(ctc_params[k], sep))
        path = jnp.argmax(log_probs, axis=-1)
        p_blank = jnp.exp(log_probs[..., blank_id])
        seg = _segment_ids(path, enc_mask, blank_id)
        seg_cap = jnp.where((seg >= 0) & (seg < Lmax), seg, Lmax)

        def pool(data_bt, seg_b):
            # data [T, C], seg [T] -> [Lmax, C] sums (overflow bucket dropped)
            return jax.ops.segment_sum(data_bt, seg_b, num_segments=Lmax + 1)[:Lmax]

        feat_sum = jax.vmap(pool)(sep, seg_cap)                       # [B,Lmax,D]
        cnt = jax.vmap(pool)(jnp.ones((B, T, 1), sep.dtype), seg_cap)  # [B,Lmax,1]
        blank_sum = jax.vmap(pool)(p_blank[..., None].astype(sep.dtype), seg_cap)
        feats = feat_sum / jnp.maximum(cnt, 1.0)
        conf = jnp.clip(1.0 - blank_sum[..., 0] / jnp.maximum(cnt[..., 0], 1.0),
                        0.0, 1.0)
        n_seg = jnp.max(jnp.where(seg >= 0, seg + 1, 0), axis=1)       # [B]
        pad_mask = jnp.arange(Lmax)[None, :] >= jnp.minimum(n_seg, Lmax)[:, None]
        feats = jnp.where(pad_mask[..., None], 0.0, feats)
        conf = jnp.where(pad_mask, 0.0, conf)
        mems.append(feats)
        masks.append(pad_mask)
        confs.append(conf)
    return (jnp.concatenate(mems, axis=1), jnp.concatenate(masks, axis=1),
            jnp.concatenate(confs, axis=1))


# ---------------------------------------------------------------------------
# CTC-prompt prefix (ASRU 2025, ctc_bridge_type='ctcprompt')
# ---------------------------------------------------------------------------
def build_multi_ctc_prefix(
    ctc_transcriptions: Sequence[jax.Array],  # K x [B, Lk] (collapsed, padded)
    embed_table: jax.Array,                   # [V, d]
    pad_id: int,
    max_prefix_len_per_head: Optional[int] = 64,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape equivalent of build_multi_ctc_prefix_from_heads
    (ctc_prompt.py:5-120): concat each sample's valid ids across heads,
    left-compact, pad with pad_id. Returns (embeds [B, L, d], mask [B, L]
    True=valid, ids [B, L])."""
    trimmed = []
    for t in ctc_transcriptions:
        if max_prefix_len_per_head is not None:
            t = t[:, :max_prefix_len_per_head]
        trimmed.append(t)
    ids = jnp.concatenate(trimmed, axis=1)               # [B, L_total]
    B, L = ids.shape
    valid = ids != pad_id
    # stable left-compaction: invalid entries sort after all valid ones
    order = jnp.argsort(jnp.where(valid, 0, 1), axis=1, stable=True)
    ids = jnp.take_along_axis(ids, order, axis=1)
    n_valid = jnp.sum(valid, axis=1)
    mask = jnp.arange(L)[None, :] < n_valid[:, None]
    ids = jnp.where(mask, ids, pad_id)
    embeds = jnp.take(embed_table, ids, axis=0)
    return embeds, mask, ids
