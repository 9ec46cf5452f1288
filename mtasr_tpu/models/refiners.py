"""CTC-guided continuous refiners + per-speaker extractors.

Re-design of /root/reference/models/refiners_weightsconcat.py. The
reference's per-timestep Python band-mask loops (lines 134-137, 161-164,
343-345) become closed-form |i-j|<=band masks; torch nn.MultiheadAttention
becomes our fused attention with the same packed in_proj/out_proj parameter
layout (for checkpoint parity).

Components:
  guidance           -- A=1-P(blank), H=entropy, nearest/linear resample
                        (lines 14-91)
  DynamicLPF         -- CTC-guided depthwise low-pass blend (98-117)
  LocalSelfAttn      -- band-masked self-attention (120-139)
  CrossRepair        -- band-masked cross-attn repair + FFN (142-167)
  SoftSpeakerRouter  -- per-speaker soft routing gate (170-184)
  ContinuousRefiner / CTCGuidedRefiner       (187-314)
  CTCPerSpeakerExtractorConcatSoftmax        (371-451, the live 'softmax'
                                              ctc_bridge)
  CTCPerSpeakerExtractorConcatNNG            (454-588, sigmoid gating)
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.models.layers import (
    gelu, layer_norm, layer_norm_init, linear, linear_init,
)


# ---------------------------------------------------------------------------
# guidance signals
# ---------------------------------------------------------------------------
def resample_to_len_1d(x_bt: jax.Array, t_target: int,
                       mode: str = "nearest") -> jax.Array:
    """[B, T] -> [B, T_target]; matches torch F.interpolate semantics
    (nearest: floor(i * T/Tt); linear: align_corners=False)."""
    T = x_bt.shape[1]
    if T == t_target:
        return x_bt
    if mode == "nearest":
        idx = jnp.floor(jnp.arange(t_target) * (T / t_target)).astype(jnp.int32)
        return x_bt[:, jnp.clip(idx, 0, T - 1)]
    pos = (jnp.arange(t_target) + 0.5) * (T / t_target) - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)
    return x_bt[:, lo] * (1 - w) + x_bt[:, hi] * w


def entropy_from_logits(logits_btv: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits_btv.astype(jnp.float32), axis=-1)
    return -(jnp.exp(logp) * logp).sum(-1)


def nonblank_from_logits(logits_btv: jax.Array, blank_id: int) -> jax.Array:
    p = jax.nn.softmax(logits_btv.astype(jnp.float32), axis=-1)
    return 1.0 - p[..., blank_id]


def build_guidance_from_ctc_logits(logits_list: Sequence[jax.Array],
                                   blank_id: int, t_target: int,
                                   resample_mode: str = "nearest",
                                   aggregate: str = "max"):
    A_list = [resample_to_len_1d(nonblank_from_logits(lg, blank_id), t_target,
                                 resample_mode) for lg in logits_list]
    H_list = [resample_to_len_1d(entropy_from_logits(lg), t_target,
                                 resample_mode) for lg in logits_list]
    A_stack = jnp.stack(A_list, -1)
    A_global = (A_stack.max(-1) if aggregate == "max" else A_stack.mean(-1))
    A_global = jnp.clip(A_global, 0.0, 1.0)
    H_global = jnp.stack(H_list, -1).mean(-1)
    return A_list, H_list, A_global, H_global


# ---------------------------------------------------------------------------
# torch-MHA-compatible attention (packed in_proj)
# ---------------------------------------------------------------------------
def init_mha_params(key, d_model: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    bound = (3.0 / d_model) ** 0.5  # torch xavier_uniform on [3E, E]
    return {
        "in_proj_weight": jax.random.uniform(k1, (3 * d_model, d_model),
                                             dtype, -bound, bound),
        "in_proj_bias": jnp.zeros((3 * d_model,), dtype),
        "out_proj": linear_init(k2, d_model, d_model, dtype=dtype),
    }


def mha(p: dict, q_in: jax.Array, kv_in: jax.Array, n_heads: int,
        attn_mask: Optional[jax.Array] = None) -> jax.Array:
    """torch F.multi_head_attention_forward semantics (self or cross);
    attn_mask: additive [T, S] or bool (True=keep) broadcastable."""
    B, T, E = q_in.shape
    S = kv_in.shape[1]
    D = E // n_heads
    w_q, w_k, w_v = jnp.split(p["in_proj_weight"], 3, axis=0)
    b_q, b_k, b_v = jnp.split(p["in_proj_bias"], 3, axis=0)
    q = (jnp.einsum("bte,oe->bto", q_in, w_q.astype(q_in.dtype))
         + b_q.astype(q_in.dtype)).reshape(B, T, n_heads, D)
    k = (jnp.einsum("bse,oe->bso", kv_in, w_k.astype(q_in.dtype))
         + b_k.astype(q_in.dtype)).reshape(B, S, n_heads, D)
    v = (jnp.einsum("bse,oe->bso", kv_in, w_v.astype(q_in.dtype))
         + b_v.astype(q_in.dtype)).reshape(B, S, n_heads, D)
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            logits = jnp.where(attn_mask, logits, -1e30)
        else:
            logits = logits + attn_mask
    probs = jax.nn.softmax(logits, -1).astype(q_in.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, E)
    return linear(p["out_proj"], out)


def band_mask(T: int, S: int, band: int) -> jax.Array:
    i = jnp.arange(T)[:, None]
    j = jnp.arange(S)[None, :]
    return jnp.abs(i - j) <= band  # bool True=keep


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------
def init_dynamic_lpf(key, d_in: int, k: int = 9, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    dirac = jnp.zeros((d_in, 1, k), dtype).at[:, 0, k // 2].set(1.0)
    return {
        "gen": {"0": linear_init(k1, 2, d_in, dtype=dtype),
                "2": linear_init(k2, d_in, k, dtype=dtype)},
        "dw": {"weight": dirac},   # depthwise conv [C, 1, k], dirac init
    }


def dynamic_lpf(p: dict, x: jax.Array, A: jax.Array, H: jax.Array) -> jax.Array:
    k = p["dw"]["weight"].shape[-1]
    coeff = jax.nn.softmax(
        linear(p["gen"]["2"],
               jax.nn.silu(linear(p["gen"]["0"],
                                  jnp.stack([A, H], -1).astype(x.dtype)))), -1)
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(p["dw"]["weight"].astype(x.dtype), (2, 1, 0)),
        window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C)
    center = coeff[..., k // 2][..., None]
    return center * x + (1 - center) * y


def init_local_self_attn(key, d_model: int, dtype=jnp.float32) -> dict:
    return {"ln": layer_norm_init(d_model, dtype),
            "attn": init_mha_params(key, d_model, dtype)}


def local_self_attn(p: dict, x: jax.Array, n_heads: int, band: int) -> jax.Array:
    qkv = layer_norm(p["ln"], x)
    m = band_mask(x.shape[1], x.shape[1], band)[None, None]
    return x + mha(p["attn"], qkv, qkv, n_heads, m)


def init_cross_repair(key, d_model: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln_q": layer_norm_init(d_model, dtype),
        "ln_kv": layer_norm_init(d_model, dtype),
        "attn": init_mha_params(k1, d_model, dtype),
        "ffn": {"0": layer_norm_init(d_model, dtype),
                "1": linear_init(k2, d_model, 4 * d_model, dtype=dtype),
                "3": linear_init(k3, 4 * d_model, d_model, dtype=dtype)},
    }


def cross_repair(p: dict, x_refined: jax.Array, x_mem: jax.Array,
                 n_heads: int, band: int) -> jax.Array:
    q = layer_norm(p["ln_q"], x_refined)
    kv = layer_norm(p["ln_kv"], x_mem)
    m = band_mask(x_refined.shape[1], x_mem.shape[1], band)[None, None]
    y = x_refined + mha(p["attn"], q, kv, n_heads, m)
    h = layer_norm(p["ffn"]["0"], y)
    h = linear(p["ffn"]["3"], gelu(linear(p["ffn"]["1"], h)))
    return y + h


def init_soft_router(key, d_model: int, K: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"mix": linear_init(k1, K, 1, dtype=dtype),
            "proj": linear_init(k2, d_model, d_model, dtype=dtype)}


def soft_router(p: dict, x: jax.Array,
                A_list: Optional[Sequence[jax.Array]]) -> jax.Array:
    if not A_list:
        return x
    A = jnp.stack(A_list, -1).astype(x.dtype)
    w = jax.nn.softmax(A, -1)
    g = jax.nn.sigmoid(linear(p["mix"], w))[..., 0]
    return linear(p["proj"], x * (0.5 + 0.5 * g[..., None]))


# ---------------------------------------------------------------------------
# ContinuousRefiner / CTCGuidedRefiner
# ---------------------------------------------------------------------------
def init_continuous_refiner(key, d_in: int, d_model: int, n_layers: int = 2,
                            K_spk: int = 0, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 1 + 4 * n_layers))
    p: dict = {"inp": linear_init(next(keys), d_in, d_model, dtype=dtype),
               "blocks": {}, "out_ln": layer_norm_init(d_model, dtype)}
    for i in range(n_layers):
        blk = {"lpf": init_dynamic_lpf(next(keys), d_model, dtype=dtype),
               "lsa": init_local_self_attn(next(keys), d_model, dtype),
               "repair": init_cross_repair(next(keys), d_model, dtype)}
        if K_spk > 0:
            blk["router"] = init_soft_router(next(keys), d_model, K_spk, dtype)
        p["blocks"][str(i)] = blk
    return p


def continuous_refiner(p: dict, x_m: jax.Array,
                       A_global: Optional[jax.Array],
                       H_global: Optional[jax.Array],
                       A_list: Optional[Sequence[jax.Array]] = None,
                       n_heads: int = 8, band_local: int = 16,
                       band_repair: int = 24) -> jax.Array:
    B, T, _ = x_m.shape
    if A_global is None:
        A_global = jnp.zeros((B, T), x_m.dtype)
    if H_global is None:
        H_global = A_global
    y = linear(p["inp"], x_m)
    mem = linear(p["inp"], x_m)
    for i in range(len(p["blocks"])):
        blk = p["blocks"][str(i)]
        y = y + dynamic_lpf(blk["lpf"], y, A_global, H_global)
        y = local_self_attn(blk["lsa"], y, n_heads, band_local)
        if "router" in blk:
            y = soft_router(blk["router"], y, A_list)
        y = cross_repair(blk["repair"], y, mem, n_heads, band_repair)
    return layer_norm(p["out_ln"], y)


def ctc_guided_refiner(p: dict, x_m: jax.Array, blank_id: int,
                       logits_list: Sequence[jax.Array],
                       aggregate: str = "max", resample_mode: str = "nearest",
                       **kw) -> jax.Array:
    A_list, _, A_global, H_global = build_guidance_from_ctc_logits(
        [jax.lax.stop_gradient(lg) for lg in logits_list], blank_id,
        x_m.shape[1], resample_mode, aggregate)
    return continuous_refiner(p, x_m, A_global, H_global, A_list, **kw)


# ---------------------------------------------------------------------------
# per-speaker extract + concat (the ctc_bridge 'softmax'/'nng' paths)
# ---------------------------------------------------------------------------
def init_extractor_concat(key, d_in: int, d_model: int, K_spk: int,
                          use_repair: bool = True, use_stream_ln: bool = False,
                          dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p: dict = {
        "proj_in": linear_init(k1, d_in, d_model, dtype=dtype),
        "spk_tags": jax.random.normal(k2, (K_spk, d_model), dtype)
        * (d_model ** -0.5),
    }
    if use_repair:
        p["repair"] = init_cross_repair(k3, d_model, dtype)
    if use_stream_ln:
        p["ln_stream"] = layer_norm_init(d_model, dtype)
    return p


def extractor_concat_softmax(
    p: dict, x_m: jax.Array, blank_id: int,
    logits_list: Sequence[jax.Array], K_spk: int,
    n_heads: int = 8, band_repair: int = 24,
    resample_mode: str = "nearest",
) -> jax.Array:
    """CTCPerSpeakerExtractorConcatSoftmax: soft per-frame speaker routing
    (softmax over K non-blank posteriors), speaker tags, band-masked repair,
    concat along time -> [B, K*Tm, d_model]."""
    B, Tm, _ = x_m.shape
    X = linear(p["proj_in"], x_m)
    A_list = [resample_to_len_1d(
        nonblank_from_logits(jax.lax.stop_gradient(lg), blank_id), Tm,
        resample_mode) for lg in logits_list]
    W = jax.nn.softmax(jnp.stack(A_list, -1), -1).astype(X.dtype)  # [B,Tm,K]
    streams = []
    for k in range(K_spk):
        Xk = X * W[..., k:k + 1]
        Xk = Xk + p["spk_tags"][k][None, None].astype(X.dtype)
        if "repair" in p:
            Xk = cross_repair(p["repair"], Xk, X, n_heads, band_repair)
        streams.append(Xk)
    return jnp.concatenate(streams, axis=1)


def extractor_concat_nng(
    p: dict, x_m: jax.Array, blank_id: int,
    logits_list: Sequence[jax.Array], K_spk: int,
    n_heads: int = 8, band_repair: int = 24,
    resample_mode: str = "nearest",
    route_alpha: float = 6.0, route_beta: float = 0.5,
) -> jax.Array:
    """CTCPerSpeakerExtractorConcatNNG: sigmoid non-normalized gating
    (supports overlapped speech), optional stream LN."""
    B, Tm, _ = x_m.shape
    X = linear(p["proj_in"], x_m)
    A_list = [resample_to_len_1d(
        nonblank_from_logits(jax.lax.stop_gradient(lg), blank_id), Tm,
        resample_mode) for lg in logits_list]
    A = jnp.stack(A_list, -1)
    W = jax.nn.sigmoid(route_alpha * (A - route_beta)).astype(X.dtype)
    streams = []
    for k in range(K_spk):
        Xk = X * W[..., k:k + 1]
        if "repair" in p:
            Xk = cross_repair(p["repair"], Xk, X, n_heads, band_repair)
        if "spk_tags" in p:
            Xk = Xk + p["spk_tags"][k][None, None].astype(X.dtype)
        if "ln_stream" in p:
            Xk = layer_norm(p["ln_stream"], Xk)
        streams.append(Xk)
    return jnp.concatenate(streams, axis=1)


# ---------------------------------------------------------------------------
# frame-guided per-speaker extractor (refiners_ctcprefix.py, experimental in
# the reference — not imported by its live model; provided for completeness)
# ---------------------------------------------------------------------------
def init_extractor_frame_guided(key, d_in_m: int, d_in_s: int, d_model: int,
                                K_spk: int, fuse_hidden: int = 0,
                                dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    p: dict = {
        "proj_m": linear_init(k1, d_in_m, d_model, dtype=dtype),
        "proj_s": linear_init(k2, d_in_s, d_model, dtype=dtype),
        "spk_tags": jax.random.normal(k3, (K_spk, d_model), dtype)
        * (d_model ** -0.5),
        "ln": layer_norm_init(d_model, dtype),
        "ffn": {"0": linear_init(k4, d_model, 4 * d_model, dtype=dtype),
                "2": linear_init(k5, 4 * d_model, d_model, dtype=dtype)},
    }
    if fuse_hidden > 0:
        ka, kb = jax.random.split(k6)
        p["fuse"] = {"0": linear_init(ka, 2 * d_model, fuse_hidden, dtype=dtype),
                     "3": linear_init(kb, fuse_hidden, d_model, dtype=dtype)}
    else:
        p["fuse"] = {"0": linear_init(k6, 2 * d_model, d_model, dtype=dtype)}
    return p


def _smooth_mean_1d(A: jax.Array, win: int) -> jax.Array:
    if win <= 1:
        return A
    pad = (win - 1) // 2
    x = jnp.pad(A, ((0, 0), (pad, pad)), mode="edge")
    kernel = jnp.ones((win,)) / win
    return jax.vmap(lambda r: jnp.convolve(r, kernel, mode="valid"))(x)


def _resample_time_nd(x: jax.Array, T: int) -> jax.Array:
    """[B, T0, D] -> [B, T, D] linear (align_corners=False semantics)."""
    B, T0, D = x.shape
    flat = x.transpose(0, 2, 1).reshape(B * D, T0)
    out = resample_to_len_1d(flat, T, mode="linear")
    return out.reshape(B, D, T).transpose(0, 2, 1)


def extractor_concat_frame_guided(
    p: dict,
    x_m: jax.Array,                       # [B, Tm, d_in_m]
    blank_id: int,
    sep_hidden_list: Sequence[jax.Array],  # K x [B, Tk, d_in_s]
    logits_list: Sequence[jax.Array],      # K x [B, Tk, V]
    *,
    smooth_win: int = 3,
    entropy_lambda: float = 0.0,
    prob_floor: float = 0.0,
    gate_mode: str = "pow",
    gate_gamma: float = 1.0,
    gate_cap: float = 1.25,
    tag_scale: float = 1.2,
) -> Tuple[jax.Array, jax.Array]:
    """CTCPerSpeakerExtractorConcatFrameGuided semantics
    (refiners_ctcprefix.py:7-247): per-speaker frame gates from 1-P(blank),
    frame-wise fusion [X; Hk_r], residual sigmoid blend, tags, LN + FFN,
    concat along time. Returns (X_concat [B, K*Tm, d], mask all-True)."""
    B, Tm, _ = x_m.shape
    K = len(sep_hidden_list)
    X = linear(p["proj_m"], x_m)

    streams = []
    for k in range(K):
        lg = jax.lax.stop_gradient(logits_list[k])
        A = nonblank_from_logits(lg, blank_id)
        if entropy_lambda > 0:
            H = entropy_from_logits(lg)
            A = A * jax.nn.sigmoid(-entropy_lambda * H)
        if prob_floor > 0:
            A = A * (A >= prob_floor)
        if smooth_win > 1:
            A = _smooth_mean_1d(A, smooth_win)
        A = resample_to_len_1d(A, Tm, mode="linear")
        if gate_mode == "pow":
            w = jnp.clip(jnp.clip(A, 0.0, None) ** gate_gamma, None, gate_cap)
        else:
            w = gate_cap * jax.nn.sigmoid(gate_gamma * (A - 0.5))

        Hk = linear(p["proj_s"], sep_hidden_list[k].astype(x_m.dtype))
        Hk_r = _resample_time_nd(Hk, Tm)
        fused_in = jnp.concatenate([X, Hk_r], axis=-1)
        if "3" in p["fuse"]:
            Yk = linear(p["fuse"]["3"], gelu(linear(p["fuse"]["0"], fused_in)))
        else:
            Yk = linear(p["fuse"]["0"], fused_in)
        s = jax.nn.sigmoid(w)[..., None].astype(X.dtype)
        Xk = (1.0 - s) * X + s * Yk
        Xk = Xk + tag_scale * p["spk_tags"][k][None, None].astype(X.dtype)
        Xk = layer_norm(p["ln"], Xk)
        Xk = Xk + linear(p["ffn"]["2"], gelu(linear(p["ffn"]["0"], Xk)))
        streams.append(Xk)

    X_concat = jnp.concatenate(streams, axis=1)
    return X_concat, jnp.ones((B, K * Tm), jnp.bool_)
