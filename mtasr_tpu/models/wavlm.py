"""WavLM speech encoder, TPU-native.

Re-designed from the reference's vendored HF WavLM
(/root/reference/models/modeling_wavlm.py) as pure JAX:

* conv feature encoder (320x downsample) as XLA convs over [B, T, C]
* transformer encoder with WavLM's gated relative position bias; the bucket
  matrix is a host-side constant per static sequence length, bias computed
  once and shared across layers (only layer 0 owns the table)
* conv adapter returning BOTH the final 8x-downsampled features and the 4x
  intermediate tap (reference mod at modeling_wavlm.py:237-254), plus the
  pre-adapter 50 Hz features used by the separator/CTC stack
  (modeling_wavlm.py:94-99)
* SpecAugment is applied from host-precomputed mask indices
  (modeling_wavlm.py:112-113 notes the mask computation is CPU work)
* layerdrop is elided (assembly sets layerdrop=0,
  utils/create_from_pretrained.py:215-218)

Param tree mirrors the HF state_dict key layout (see utils/torch_interop.py).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtasr_tpu.config import WavLMConfig
from mtasr_tpu.models.layers import (
    ACT, conv1d, conv1d_init, dropout, embedding_init, gelu, group_norm,
    layer_norm, layer_norm_init, linear, linear_init, resolve_act,
)
from mtasr_tpu.ops.attention import dot_product_attention
from mtasr_tpu.ops.relpos import gated_position_bias, relative_position_bucket


@dataclass
class WavLMOutput:
    last_hidden_state: jax.Array          # [B, T/8, out_hidden] post-adapter
    encoder_hidden_state: jax.Array       # [B, T, hidden] pre-adapter (50 Hz)
    wavlm_down_hidden_states: jax.Array   # [B, T/4, out_hidden] adapter tap
    extract_features: jax.Array           # [B, T, conv_dim[-1]]


jax.tree_util.register_dataclass(
    WavLMOutput,
    data_fields=["last_hidden_state", "encoder_hidden_state",
                 "wavlm_down_hidden_states", "extract_features"],
    meta_fields=[])


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def init_wavlm_params(key: jax.Array, cfg: WavLMConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 256))
    p: dict = {}

    # conv feature encoder
    conv_layers = {}
    in_dim = 1
    for i, (out_dim, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        lp = {"conv": conv1d_init(next(keys), in_dim, out_dim, k,
                                  bias=cfg.conv_bias, dtype=dtype)}
        if cfg.feat_extract_norm == "layer":
            lp["layer_norm"] = layer_norm_init(out_dim, dtype)
        elif cfg.feat_extract_norm == "group" and i == 0:
            lp["layer_norm"] = layer_norm_init(out_dim, dtype)  # GroupNorm affine
        conv_layers[str(i)] = lp
        in_dim = out_dim
    p["feature_extractor"] = {"conv_layers": conv_layers}

    p["feature_projection"] = {
        "layer_norm": layer_norm_init(cfg.conv_dim[-1], dtype),
        "projection": linear_init(next(keys), cfg.conv_dim[-1], cfg.hidden_size,
                                  dtype=dtype),
    }
    if cfg.mask_time_prob > 0 or cfg.mask_feature_prob > 0:
        p["masked_spec_embed"] = jax.random.uniform(
            next(keys), (cfg.hidden_size,), dtype)

    # encoder
    pos_conv = conv1d_init(
        next(keys), cfg.hidden_size, cfg.hidden_size,
        cfg.num_conv_pos_embeddings,
        groups=cfg.num_conv_pos_embedding_groups, dtype=dtype)
    if cfg.pos_conv_weight_norm:
        # torch weight_norm init (dim=2): g = ||w|| over (out, in) per
        # kernel position, v = w — see config.pos_conv_weight_norm
        w = pos_conv.pop("weight")
        pos_conv["weight_g"] = jnp.sqrt(
            jnp.sum(w.astype(jnp.float32) ** 2, axis=(0, 1),
                    keepdims=True)).astype(dtype)
        pos_conv["weight_v"] = w
    enc: dict = {
        "pos_conv_embed": {"conv": pos_conv},
        "layer_norm": layer_norm_init(cfg.hidden_size, dtype),
        "layers": {},
    }
    E, H = cfg.hidden_size, cfg.num_attention_heads
    for i in range(cfg.num_hidden_layers):
        att = {
            "q_proj": linear_init(next(keys), E, E, dtype=dtype),
            "k_proj": linear_init(next(keys), E, E, dtype=dtype),
            "v_proj": linear_init(next(keys), E, E, dtype=dtype),
            "out_proj": linear_init(next(keys), E, E, dtype=dtype),
            "gru_rel_pos_linear": linear_init(next(keys), E // H, 8, dtype=dtype),
            "gru_rel_pos_const": jnp.ones((H,), dtype),
        }
        if i == 0:
            att["rel_attn_embed"] = embedding_init(
                next(keys), cfg.num_buckets, H, dtype=dtype)
        enc["layers"][str(i)] = {
            "attention": att,
            "layer_norm": layer_norm_init(E, dtype),
            "feed_forward": {
                "intermediate_dense": linear_init(
                    next(keys), E, cfg.intermediate_size, dtype=dtype),
                "output_dense": linear_init(
                    next(keys), cfg.intermediate_size, E, dtype=dtype),
            },
            "final_layer_norm": layer_norm_init(E, dtype),
        }
    p["encoder"] = enc

    if cfg.add_adapter:
        ad: dict = {"layers": {}}
        out_h = cfg.out_hidden
        if out_h != cfg.hidden_size:
            ad["proj"] = linear_init(next(keys), cfg.hidden_size, out_h, dtype=dtype)
            ad["proj_layer_norm"] = layer_norm_init(out_h, dtype)
        for i in range(cfg.num_adapter_layers):
            ad["layers"][str(i)] = {"conv": conv1d_init(
                next(keys), out_h, 2 * out_h, cfg.adapter_kernel_size, dtype=dtype)}
        p["adapter"] = ad
    return p


# ---------------------------------------------------------------------------
# length / mask arithmetic (reference: modeling_wavlm.py:467-577)
# ---------------------------------------------------------------------------
def conv_output_lengths(cfg: WavLMConfig, lengths: jax.Array) -> jax.Array:
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return lengths


def feat_extract_output_lengths(cfg: WavLMConfig, lengths: jax.Array,
                                num_adapter_layers: int) -> jax.Array:
    lengths = conv_output_lengths(cfg, lengths)
    for _ in range(num_adapter_layers):
        lengths = (lengths - 1) // cfg.adapter_stride + 1
    return lengths


def _lengths_to_mask(lengths: jax.Array, T: int) -> jax.Array:
    return jnp.arange(T)[None, :] < jnp.clip(lengths, 0, T)[:, None]


def feature_vector_attention_mask(cfg: WavLMConfig, T: int,
                                  attention_mask: jax.Array,
                                  num_adapter_layers: Optional[int] = None) -> jax.Array:
    """Boolean [B, T] mask on the feature axis. `num_adapter_layers`:
    None -> full adapter (decoder-side mask), 0 -> conv-only (`_x0`, the CTC
    mask), n -> after n adapter convs (`_x4` uses num_adapter_layers-1)."""
    if num_adapter_layers is None:
        num_adapter_layers = cfg.num_adapter_layers if cfg.add_adapter else 0
    lengths = feat_extract_output_lengths(
        cfg, jnp.sum(attention_mask.astype(jnp.int32), axis=-1), num_adapter_layers)
    return _lengths_to_mask(lengths, T)


# ---------------------------------------------------------------------------
# forward blocks
# ---------------------------------------------------------------------------
def _conv0_fast_path(cfg: WavLMConfig, B: int, S: int) -> bool:
    impl = getattr(cfg, "conv0_impl", "auto")
    if impl == "xla":
        return False
    if impl == "auto" and jax.default_backend() == "cpu":
        return False
    from mtasr_tpu.ops.pallas.conv_frontend import supported
    return supported(cfg.conv_kernel[0], cfg.conv_stride[0], 1,
                     cfg.conv_dim[0], B, S)


def feature_encoder(p: dict, cfg: WavLMConfig, input_values: jax.Array) -> jax.Array:
    """[B, S] waveform -> [B, T, conv_dim[-1]] at 50 Hz."""
    act = resolve_act(cfg.feat_extract_activation,
                      getattr(cfg, "gelu_impl", "auto"))
    B, S = input_values.shape
    start = 0
    if _conv0_fast_path(cfg, B, S):
        # fused Pallas layer 0 (see ops/pallas/conv_frontend.py: XLA runs
        # this k=10/s=5/C_in=1 conv at 0.8 TF/s — 53 ms of the 146 ms
        # frontend at the bench shape; the kernel measures ~29 ms)
        from mtasr_tpu.ops.pallas.conv_frontend import conv0_fused
        lp = p["conv_layers"]["0"]
        fuse_ln = (cfg.feat_extract_norm == "layer"
                   and cfg.feat_extract_activation == "gelu")
        x = conv0_fused(
            input_values, lp["conv"]["weight"], lp["conv"].get("bias"),
            lp["layer_norm"]["weight"] if fuse_ln else None,
            lp["layer_norm"]["bias"] if fuse_ln else None,
            stride=cfg.conv_stride[0], fuse_ln=fuse_ln, fuse_act=fuse_ln,
            interpret=jax.default_backend() == "cpu")
        if not fuse_ln:
            if cfg.feat_extract_norm == "layer":
                x = layer_norm(lp["layer_norm"], x)
            elif cfg.feat_extract_norm == "group":
                x = jnp.swapaxes(
                    group_norm(lp["layer_norm"], jnp.swapaxes(x, 1, 2),
                               num_groups=cfg.conv_dim[0]), 1, 2)
            x = act(x)
        start = 1
    else:
        x = input_values[:, :, None]  # [B, S, 1]
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        if i < start:
            continue
        lp = p["conv_layers"][str(i)]
        x = conv1d(lp["conv"], x, stride=s, impl=cfg.conv_impl)
        if cfg.feat_extract_norm == "layer":
            x = layer_norm(lp["layer_norm"], x)
        elif cfg.feat_extract_norm == "group" and i == 0:
            x = jnp.swapaxes(group_norm(lp["layer_norm"], jnp.swapaxes(x, 1, 2),
                                        num_groups=cfg.conv_dim[0]), 1, 2)
        x = act(x)
    return x


def _attention_gate(p: dict, x: jax.Array, n_heads: int) -> jax.Array:
    """Per-(batch, head, query) scalar gate for the shared rel-pos bias
    (the query-dependent half of HF's gated_position_bias)."""
    B, T, E = x.shape
    head_dim = E // n_heads
    gh = x.reshape(B, T, n_heads, head_dim)
    w = p["gru_rel_pos_linear"]["weight"].astype(x.dtype)
    b = p["gru_rel_pos_linear"]["bias"].astype(x.dtype)
    proj = jnp.einsum("bthd,ed->bthe", gh, w) + b
    proj = proj.reshape(B, T, n_heads, 2, 4).sum(-1)
    gates = jax.nn.sigmoid(proj)
    gate_a, gate_b = gates[..., 0], gates[..., 1]
    gate_out = gate_a * (gate_b * p["gru_rel_pos_const"].astype(x.dtype)
                         [None, None, :] - 1.0) + 2.0
    return gate_out.transpose(0, 2, 1)        # [B, H, T]


def _wavlm_attention(p: dict, cfg: WavLMConfig, x: jax.Array,
                     position_bias: jax.Array,
                     key_valid_mask: Optional[jax.Array]) -> jax.Array:
    B, T, E = x.shape
    H = cfg.num_attention_heads
    D = E // H
    q = linear(p["q_proj"], x).reshape(B, T, H, D)
    k = linear(p["k_proj"], x).reshape(B, T, H, D)
    v = linear(p["v_proj"], x).reshape(B, T, H, D)

    impl = cfg.attention_impl
    if impl == "auto":
        # flash needs compiled Mosaic; on CPU it would run interpreted
        # (orders of magnitude slower), so auto resolves per-backend
        impl = "xla" if jax.default_backend() == "cpu" else "flash"
    if impl in ("flash", "flash_spmd"):
        from mtasr_tpu.ops.pallas.flash_attention import flash_attention
        from mtasr_tpu.ops.pallas.spmd import flash_attention_spmd
        gate = _attention_gate(p, x, H)
        kv_lens = (jnp.sum(key_valid_mask.astype(jnp.int32), -1)
                   if key_valid_mask is not None else None)
        # flash_spmd: the same kernels wrapped in custom_partitioning
        # rules (ops/pallas/spmd.py) so a dp x tp mesh splits them
        # per-device instead of gathering; selected by the mesh-building
        # CLIs / Trainer. Interpret mode on CPU keeps the mesh tests and
        # virtual-device dryruns runnable.
        fa = (functools.partial(flash_attention_spmd,
                                interpret=jax.default_backend() == "cpu")
              if impl == "flash_spmd" else flash_attention)
        out = fa(q, k, v, kv_lens=kv_lens,
                 pos_bias=position_bias.astype(x.dtype),
                 gate=gate)
    else:
        bias = gated_position_bias(
            position_bias, x, p["gru_rel_pos_linear"]["weight"].T,
            p["gru_rel_pos_linear"]["bias"], p["gru_rel_pos_const"], H)
        mask = None
        if key_valid_mask is not None:
            mask = key_valid_mask[:, None, None, :]
        out = dot_product_attention(q, k, v, bias=bias, mask=mask)
    return linear(p["out_proj"], out.reshape(B, T, E))


def _feed_forward(p: dict, cfg: WavLMConfig, x: jax.Array, deterministic,
                  rng) -> jax.Array:
    # gelu here runs over [B, T, intermediate] x N layers — 4.7e9 elements
    # at the bench shape, VPU-bound; the polynomial-erf path halves it
    act = resolve_act(cfg.hidden_act, getattr(cfg, "gelu_impl", "auto"))
    r1 = r2 = None
    if rng is not None:
        rng, r1, r2 = jax.random.split(rng, 3)
    h = linear(p["intermediate_dense"], x)
    h = act(h)
    h = dropout(h, cfg.activation_dropout, r1, deterministic)
    h = linear(p["output_dense"], h)
    h = dropout(h, cfg.hidden_dropout, r2, deterministic)
    return h


def wavlm_encoder_layer(lp: dict, cfg: WavLMConfig, hidden: jax.Array,
                        position_bias: jax.Array,
                        attention_mask: Optional[jax.Array],
                        r_attn: Optional[jax.Array] = None,
                        r_ff: Optional[jax.Array] = None,
                        deterministic: bool = True) -> jax.Array:
    """One transformer layer (module-level so the pipelined decode engine
    can interleave individual layers of the NEXT batch's encode into the
    decode loop of the current batch, generate/pipelined.py)."""
    if cfg.do_stable_layer_norm:
        h = layer_norm(lp["layer_norm"], hidden, cfg.layer_norm_eps)
        h = _wavlm_attention(lp["attention"], cfg, h, position_bias,
                             attention_mask)
        h = dropout(h, cfg.hidden_dropout, r_attn, deterministic)
        hidden = hidden + h
        hidden = hidden + _feed_forward(
            lp["feed_forward"], cfg,
            layer_norm(lp["final_layer_norm"], hidden, cfg.layer_norm_eps),
            deterministic, r_ff)
    else:
        h = _wavlm_attention(lp["attention"], cfg, hidden, position_bias,
                             attention_mask)
        h = dropout(h, cfg.hidden_dropout, r_attn, deterministic)
        hidden = hidden + h
        hidden = layer_norm(lp["layer_norm"], hidden, cfg.layer_norm_eps)
        hidden = hidden + _feed_forward(lp["feed_forward"], cfg, hidden,
                                        deterministic, r_ff)
        hidden = layer_norm(lp["final_layer_norm"], hidden,
                            cfg.layer_norm_eps)
    return hidden


def wavlm_encoder_prologue(p: dict, cfg: WavLMConfig, hidden: jax.Array,
                           attention_mask: Optional[jax.Array]
                           ) -> Tuple[jax.Array, jax.Array]:
    """Everything before the transformer layers (inference form): input
    masking, positional conv embedding, the non-stable-LN pre-norm, and the
    shared relative-position bias. Returns (hidden, position_bias)."""
    B, T, E = hidden.shape
    if attention_mask is not None:
        hidden = hidden * attention_mask[:, :, None].astype(hidden.dtype)
    conv_p = p["pos_conv_embed"]["conv"]
    if "weight_v" in conv_p:
        v = conv_p["weight_v"].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        w = conv_p["weight_g"].astype(jnp.float32) * v / norm
        conv_p = {"weight": w.astype(conv_p["weight_v"].dtype),
                  **({"bias": conv_p["bias"]} if "bias" in conv_p else {})}
    pos = conv1d(conv_p, hidden,
                 padding=cfg.num_conv_pos_embeddings // 2,
                 groups=cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1, :]
    hidden = hidden + gelu(pos)
    if not cfg.do_stable_layer_norm:
        hidden = layer_norm(p["layer_norm"], hidden, cfg.layer_norm_eps)
    buckets = jnp.asarray(relative_position_bucket(
        T, T, cfg.num_buckets, cfg.max_bucket_distance))
    table = p["layers"]["0"]["attention"]["rel_attn_embed"]["weight"]
    position_bias = jnp.transpose(jnp.take(table, buckets, axis=0), (2, 0, 1))
    return hidden, position_bias


def wavlm_encoder(p: dict, cfg: WavLMConfig, hidden: jax.Array,
                  attention_mask: Optional[jax.Array],
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None) -> jax.Array:
    B, T, E = hidden.shape
    if attention_mask is not None:
        hidden = hidden * attention_mask[:, :, None].astype(hidden.dtype)

    # positional conv embedding (grouped conv, same-pad trims one frame).
    # Dispatch on keys: a weight-normed tree carries (weight_g, weight_v)
    # — HF WavLM's torch weight_norm(dim=2): magnitude per kernel position,
    # direction normalized over (out, in). Composed in f32 so the (g, v)
    # gradients match torch's parametrization backward.
    conv_p = p["pos_conv_embed"]["conv"]
    if "weight_v" in conv_p:
        v = conv_p["weight_v"].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        w = conv_p["weight_g"].astype(jnp.float32) * v / norm
        conv_p = {"weight": w.astype(conv_p["weight_v"].dtype),
                  **({"bias": conv_p["bias"]} if "bias" in conv_p else {})}
    pos = conv1d(conv_p, hidden,
                 padding=cfg.num_conv_pos_embeddings // 2,
                 groups=cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1, :]
    pos = gelu(pos)
    hidden = hidden + pos
    if not cfg.do_stable_layer_norm:
        hidden = layer_norm(p["layer_norm"], hidden, cfg.layer_norm_eps)
    if rng is not None:
        rng, r = jax.random.split(rng)
        hidden = dropout(hidden, cfg.hidden_dropout, r, deterministic)

    # shared relative position bias from layer 0's table (constant buckets)
    buckets = jnp.asarray(relative_position_bucket(
        T, T, cfg.num_buckets, cfg.max_bucket_distance))
    table = p["layers"]["0"]["attention"]["rel_attn_embed"]["weight"]
    position_bias = jnp.transpose(jnp.take(table, buckets, axis=0), (2, 0, 1))

    def _run_layer(lp, hidden, r_attn, r_ff):
        return wavlm_encoder_layer(lp, cfg, hidden, position_bias,
                                   attention_mask, r_attn, r_ff,
                                   deterministic)

    if cfg.scan_layers and cfg.num_hidden_layers > 1:
        # layer 0 unrolled (owns rel_attn_embed); 1..N-1 scanned
        r0a = r0f = None
        if rng is not None:
            rng, r0a, r0f = jax.random.split(rng, 3)
        hidden = _run_layer(p["layers"]["0"], hidden, r0a, r0f)
        rest = [p["layers"][str(i)] for i in range(1, cfg.num_hidden_layers)]
        n_rest = len(rest)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rest)
        if rng is not None:
            keys = jax.random.split(rng, 2 * n_rest).reshape(n_rest, 2)

            def scan_body(hidden, inp):
                lp, ks = inp
                return _run_layer(lp, hidden, ks[0], ks[1]), None
            xs = (stacked, keys)
        else:
            def scan_body(hidden, lp):
                return _run_layer(lp, hidden, None, None), None
            xs = stacked

        if cfg.remat:
            # full per-layer remat (no policy): the dots-with-no-batch-dims
            # policy saves EVERY matmul output, so the scan kept a stacked
            # [L, B, T, 4*H] MLP intermediate (1.42 GB at flagship B=16) and
            # OOM'd the 16 GB chip; saving only layer inputs costs one extra
            # forward per layer in backward and caps memory at [L, B, T, H]
            scan_body = jax.checkpoint(scan_body)
        hidden, _ = jax.lax.scan(scan_body, hidden, xs)
        if cfg.do_stable_layer_norm:
            hidden = layer_norm(p["layer_norm"], hidden, cfg.layer_norm_eps)
        return hidden

    for i in range(cfg.num_hidden_layers):
        lp = p["layers"][str(i)]
        r_attn = r_ff = None
        if rng is not None:
            rng, r_attn, r_ff = jax.random.split(rng, 3)

        def layer_fn(lp, hidden):
            if cfg.do_stable_layer_norm:
                h = layer_norm(lp["layer_norm"], hidden, cfg.layer_norm_eps)
                h = _wavlm_attention(lp["attention"], cfg, h, position_bias,
                                     attention_mask)
                h = dropout(h, cfg.hidden_dropout, r_attn, deterministic)
                hidden = hidden + h
                hidden = hidden + _feed_forward(
                    lp["feed_forward"], cfg,
                    layer_norm(lp["final_layer_norm"], hidden,
                               cfg.layer_norm_eps),
                    deterministic, r_ff)
            else:
                h = _wavlm_attention(lp["attention"], cfg, hidden,
                                     position_bias, attention_mask)
                h = dropout(h, cfg.hidden_dropout, r_attn, deterministic)
                hidden = hidden + h
                hidden = layer_norm(lp["layer_norm"], hidden,
                                    cfg.layer_norm_eps)
                hidden = hidden + _feed_forward(lp["feed_forward"], cfg,
                                                hidden, deterministic, r_ff)
                hidden = layer_norm(lp["final_layer_norm"], hidden,
                                    cfg.layer_norm_eps)
            return hidden

        if cfg.remat:
            layer_fn = jax.checkpoint(layer_fn)
        hidden = layer_fn(lp, hidden)

    if cfg.do_stable_layer_norm:
        hidden = layer_norm(p["layer_norm"], hidden, cfg.layer_norm_eps)
    return hidden


def wavlm_adapter(p: dict, cfg: WavLMConfig, hidden: jax.Array):
    """Returns (final 8x features, 4x tap) — reference WavLMAdapter mod
    (modeling_wavlm.py:237-254)."""
    if "proj" in p:
        hidden = linear(p["proj"], hidden)
        hidden = layer_norm(p["proj_layer_norm"], hidden)
    tap = hidden
    pad = cfg.adapter_kernel_size // 2
    for i in range(cfg.num_adapter_layers):
        h = conv1d(p["layers"][str(i)]["conv"], hidden,
                   stride=cfg.adapter_stride, padding=pad,
                   impl=cfg.conv_impl)
        a, b = jnp.split(h, 2, axis=-1)
        hidden = a * jax.nn.sigmoid(b)
        if i == 1:
            tap = hidden
    return hidden, tap


def wavlm_forward(params: dict, cfg: WavLMConfig, input_values: jax.Array,
                  attention_mask: Optional[jax.Array] = None,
                  mask_time_indices: Optional[jax.Array] = None,
                  mask_feature_indices: Optional[jax.Array] = None,
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None) -> WavLMOutput:
    """input_values: [B, S] normalized waveform; attention_mask: [B, S].

    SpecAugment indices are host-precomputed (data/specaugment.py) and
    passed in — no data-dependent masking inside jit.
    """
    extract = feature_encoder(params["feature_extractor"], cfg, input_values)
    T = extract.shape[1]

    feat_mask = None
    if attention_mask is not None:
        feat_mask = _lengths_to_mask(
            conv_output_lengths(cfg, jnp.sum(attention_mask.astype(jnp.int32), -1)), T)

    norm_features = layer_norm(params["feature_projection"]["layer_norm"],
                               extract, cfg.layer_norm_eps)
    hidden = linear(params["feature_projection"]["projection"], norm_features)
    if rng is not None:
        rng, r = jax.random.split(rng)
        hidden = dropout(hidden, cfg.feat_proj_dropout, r, deterministic)

    if mask_time_indices is not None and "masked_spec_embed" in params:
        hidden = jnp.where(mask_time_indices[:, :, None],
                           params["masked_spec_embed"].astype(hidden.dtype),
                           hidden)
    if mask_feature_indices is not None:
        hidden = jnp.where(mask_feature_indices[:, None, :], 0.0, hidden)

    hidden = wavlm_encoder(params["encoder"], cfg, hidden, feat_mask,
                           deterministic, rng)
    encoder_hidden_state = hidden

    if cfg.add_adapter:
        last, tap = wavlm_adapter(params["adapter"], cfg, hidden)
    else:
        last, tap = hidden, hidden

    return WavLMOutput(
        last_hidden_state=last,
        encoder_hidden_state=encoder_hidden_state,
        wavlm_down_hidden_states=tap,
        extract_features=norm_features,
    )
