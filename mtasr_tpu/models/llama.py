"""LLaMA decoder, TPU-native, with speech-prefix splicing support.

Re-design of the reference's vendored LLaMA
(/root/reference/models/modeling_llama.py, llama_modules.py). Key differences
from the torch original, driven by XLA/static-shape semantics:

* The reference discovers splice points by scanning input_ids for
  <boss>/<eoss> at runtime (modeling_llama.py:170-228) and concatenates
  mid-sequence. Here the *composite model* builds a static
  `[prefix | speech | suffix]` embedding layout host/graph-side and hands the
  decoder a plain `inputs_embeds` + `position_ids` — the decoder itself is
  splice-agnostic, so every shape is static under jit.
* DynamicCache becomes a preallocated HBM KV cache (`KVCache`) written with
  `dynamic_update_slice`, with explicit `cache_offset` — reproducing the
  reference's cache_position arithmetic (modeling_llama.py:200-219) where
  speech frames occupy cache slots like ordinary tokens.
* Per-layer cross-attention adapters hook in right after the self-attention
  residual (llama_modules.py:387-400) via `layer_callback`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.config import LlamaConfig
from mtasr_tpu.models.layers import embedding_init, linear, linear_init
from mtasr_tpu.ops.attention import dot_product_attention
from mtasr_tpu.ops.norms import rms_norm
from mtasr_tpu.ops.rope import apply_rotary_emb, compute_rope_freqs, rope_cos_sin


@dataclass
class KVCache:
    """Preallocated cache. k/v are PER-LAYER tuples of [B, S_max, H_kv*D]
    buffers (not one stacked array) so a decode step updates only its own
    layer's buffer via dynamic_update_slice — a stacked [L, ...] array would
    make XLA copy the whole stack on every `.at[layer].set`. The head and
    head_dim axes are stored MERGED: TPU HBM arrays are tiled with the lane
    (minor-most) dim padded to 128, so a [..., H, 64] layout physically
    doubles every cache read/write; merged [..., H*64] is unpadded (measured:
    the combined DUS+attention decode step dropped 11.9 -> 7.0 ms/step at
    B=128, S=214 when the lane dims were merged). Attention reshapes to
    [B, S, H, D] in-register; XLA fuses the split into the einsum reads.
    `valid` is a [B, S_max] key-validity mask (False = empty or padding
    slot).

    int8 mode (init(..., quantized=True)): k/v buffers are int8 with
    per-(batch, position, head) symmetric scales, stored for BOTH k and v
    in ONE array per layer, TRANSPOSED as [B, 2*H_kv, S_max] bf16
    (k scales in rows [0, H_kv), v scales in [H_kv, 2*H_kv)) — the Pallas
    decode kernel's required layout, so no per-step swapaxes sits between
    the cache and the kernel. Why merged + bf16: each scale write is a
    dynamic_update_slice at a LANE offset (position lives in the minor
    dim), which XLA cannot keep fully in place — the per-step decode
    matrix measured the scale updates at 0.82 ms/step across 16 layers
    (B=256, S=214) with the round-3b two-f32-arrays storage; merging
    halves the op count and bf16 halves the copied bytes. bf16 scale
    precision costs <0.4% extra relative quantization error (the int8
    mantissa itself is ~0.8%). Measured note (v5e, B=128, S=761,
    w8a8+int8): the transposed storage is perf-NEUTRAL vs [B, S, H_kv] +
    per-step swapaxes — XLA already stored the H_kv-minor array S-minor —
    so the kernel-native layout is kept as strictly simpler. At long
    context the decode step is KV-bandwidth bound (B=128, L~650: ~2.7 GB
    of KV reads/step bf16 vs 2.5 GB of weights), so halving KV bytes
    attacks the dominant stream. Dequant happens in-register inside the
    attention kernel — the K scale folds into the scores, the V scale
    into the softmax probs, so no dequantized cache ever materializes."""
    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]
    valid: jax.Array
    kv_scale: Optional[Tuple[jax.Array, ...]] = None

    @classmethod
    def init(cls, cfg: LlamaConfig, batch: int, max_len: int,
             dtype=jnp.bfloat16, quantized: bool = False) -> "KVCache":
        shape = (batch, max_len, cfg.num_key_value_heads * cfg.head_dim_)
        n = cfg.num_hidden_layers
        if quantized:
            sshape = (batch, 2 * cfg.num_key_value_heads, max_len)
            return cls(
                k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
                v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
                valid=jnp.zeros((batch, max_len), jnp.bool_),
                kv_scale=tuple(jnp.zeros(sshape, jnp.bfloat16)
                               for _ in range(n)))
        return cls(k=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
                   v=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
                   valid=jnp.zeros((batch, max_len), jnp.bool_))

    @property
    def max_len(self) -> int:
        return self.k[0].shape[1]


jax.tree_util.register_dataclass(
    KVCache, data_fields=["k", "v", "valid", "kv_scale"],
    meta_fields=[])


def _quantize_kv(x: jax.Array):
    """[B, L, H, D] -> (int8 [B, L, H, D], scale bf16 [B, L, H]).

    The scale is rounded to bf16 BEFORE quantizing so the stored int8
    values are exact multiples of the scale the kernel will dequantize
    with (quantize/dequantize round-trip stays consistent)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-8).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(xf / s[..., None].astype(jnp.float32)),
                 -127, 127).astype(jnp.int8)
    return q, s


def init_llama_params(key: jax.Array, cfg: LlamaConfig,
                      dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
    std = 0.02
    H = cfg.hidden_size
    D = cfg.head_dim_
    p: dict = {"model": {
        "embed_tokens": embedding_init(next(keys), cfg.vocab_size, H, std, dtype),
        "layers": {},
        "norm": {"weight": jnp.ones((H,), dtype)},
    }}
    for i in range(cfg.num_hidden_layers):
        p["model"]["layers"][str(i)] = {
            "self_attn": {
                "q_proj": linear_init(next(keys), H, cfg.num_attention_heads * D,
                                      bias=cfg.attention_bias, std=std, dtype=dtype),
                "k_proj": linear_init(next(keys), H, cfg.num_key_value_heads * D,
                                      bias=cfg.attention_bias, std=std, dtype=dtype),
                "v_proj": linear_init(next(keys), H, cfg.num_key_value_heads * D,
                                      bias=cfg.attention_bias, std=std, dtype=dtype),
                "o_proj": linear_init(next(keys), cfg.num_attention_heads * D, H,
                                      bias=cfg.attention_bias, std=std, dtype=dtype),
            },
            "mlp": {
                "gate_proj": linear_init(next(keys), H, cfg.intermediate_size,
                                         bias=cfg.mlp_bias, std=std, dtype=dtype),
                "up_proj": linear_init(next(keys), H, cfg.intermediate_size,
                                       bias=cfg.mlp_bias, std=std, dtype=dtype),
                "down_proj": linear_init(next(keys), cfg.intermediate_size, H,
                                         bias=cfg.mlp_bias, std=std, dtype=dtype),
            },
            "input_layernorm": {"weight": jnp.ones((H,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((H,), dtype)},
        }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = linear_init(next(keys), H, cfg.vocab_size, bias=False,
                                   std=std, dtype=dtype)
    return p


def embed_tokens(params: dict, cfg: LlamaConfig, input_ids: jax.Array,
                 dtype=None) -> jax.Array:
    w = params["model"]["embed_tokens"]["weight"]
    if dtype is not None:
        w = w.astype(dtype)
    # mode="clip": jnp.take's default out-of-bounds fill is NaN, which would
    # silently poison the forward if an id ever exceeds the table (e.g. a
    # config whose special tokens were not resized into the vocab)
    return jnp.take(w, input_ids, axis=0, mode="clip")


def lm_head(params: dict, cfg: LlamaConfig, hidden: jax.Array) -> jax.Array:
    if "lm_head" in params and ("weight_q8" in params["lm_head"]
                                or "weight_q8a8" in params["lm_head"]):
        return linear(params["lm_head"], hidden)
    w = (params["lm_head"]["weight"] if "lm_head" in params
         else params["model"]["embed_tokens"]["weight"]).astype(hidden.dtype)
    return jnp.einsum("...h,vh->...v", hidden, w)


def _lora_linear(p_entry: dict, x: jax.Array, ab: Optional[dict],
                 scale, rng: Optional[jax.Array],
                 dropout: float) -> jax.Array:
    """linear() plus a PEFT-style LoRA branch: y += scale * B(A(drop(x))).

    Matches the reference's PEFT insertion semantics (dropout on the LoRA
    branch input only, never the base path —
    /root/reference/src/insert_adapter_decoder.py:56-60, lora_dropout=0.1).
    The low-rank branch runs in f32 (r is tiny, cost negligible) so LoRA
    training is precision-safe under bf16 base weights."""
    y = linear(p_entry, x)
    if ab is None:
        return y
    xl = x.astype(jnp.float32)
    if rng is not None and dropout > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, x.shape)
        xl = jnp.where(keep, xl / (1.0 - dropout), 0.0)
    delta = (xl @ ab["lora_A"].astype(jnp.float32).T) \
        @ ab["lora_B"].astype(jnp.float32).T
    return y + (delta * scale).astype(y.dtype)


# Fixed per-projection RNG fold constants for LoRA dropout. Python's
# hash(str) is salted per process (PYTHONHASHSEED), so the previous
# hash(name) % 997 broke bitwise-deterministic resume across restarts
# (VERDICT r2 weak #5 / ADVICE r2).
_LORA_RNG_FOLD = {"q_proj": 0, "k_proj": 1, "v_proj": 2, "o_proj": 3}


def _decode_attn_ok(cfg: LlamaConfig) -> bool:
    from mtasr_tpu.ops.pallas.decode_attention import supported
    return supported(cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim_)


def _attention(p: dict, cfg: LlamaConfig, x: jax.Array,
               cos: jax.Array, sin: jax.Array,
               mask: Optional[jax.Array],
               layer_idx: int,
               kv_cache: Optional[KVCache],
               cache_offset,
               lora_layer: Optional[dict] = None,
               lora_scale=None,
               lora_rng: Optional[jax.Array] = None,
               lora_dropout: float = 0.0) -> Tuple[jax.Array, Optional[KVCache]]:
    B, L, H = x.shape
    D = cfg.head_dim_

    def proj(name, width):
        ab = lora_layer.get(name) if lora_layer is not None else None
        rng = (jax.random.fold_in(lora_rng, _LORA_RNG_FOLD[name])
               if (lora_rng is not None and ab is not None) else None)
        return _lora_linear(p[name], x, ab, lora_scale, rng, lora_dropout)

    q = proj("q_proj", None).reshape(B, L, cfg.num_attention_heads, D)
    k = proj("k_proj", None).reshape(B, L, cfg.num_key_value_heads, D)
    v = proj("v_proj", None).reshape(B, L, cfg.num_key_value_heads, D)
    q, k = apply_rotary_emb(q, k, cos, sin)

    if kv_cache is not None:
        # cache buffers store [B, S_max, H*D] (merged lanes — see KVCache);
        # DUS on the merged form, split back to heads only for the einsum
        # (the split fuses into the attention reads)
        B_, L_, Hkv_, D_ = k.shape
        S_all = kv_cache.max_len
        buf_k, buf_v = kv_cache.k[layer_idx], kv_cache.v[layer_idx]
        if kv_cache.kv_scale is not None:
            k8, ks = _quantize_kv(k)
            v8, vs = _quantize_kv(v)
            k_all = jax.lax.dynamic_update_slice(
                buf_k, k8.reshape(B_, L_, Hkv_ * D_), (0, cache_offset, 0))
            v_all = jax.lax.dynamic_update_slice(
                buf_v, v8.reshape(B_, L_, Hkv_ * D_), (0, cache_offset, 0))
            # k and v scales live in ONE transposed [B, 2*Hkv, S] array
            # (see KVCache) so the lane-offset update — which XLA cannot
            # keep fully in place — is paid once per layer, not twice;
            # the swapaxes fuses into the _quantize_kv producer. Rows are
            # kv-head-major INTERLEAVED (k_0, v_0, k_1, v_1, …): the row
            # dim is then a Shardy compound factor (kv two) with kv major,
            # so TP head-sharding partitions the scales consistently with
            # the int8 cache buffers (ops/pallas/spmd.py).
            kvs_all = jax.lax.dynamic_update_slice(
                kv_cache.kv_scale[layer_idx],
                jnp.swapaxes(jnp.stack([ks, vs], axis=-1)
                             .reshape(B_, L_, 2 * Hkv_), 1, 2),
                (0, 0, cache_offset))
            new_kvs = (kv_cache.kv_scale[:layer_idx] + (kvs_all,)
                       + kv_cache.kv_scale[layer_idx + 1:])
            # dequantized views for the XLA fallback path only — built
            # lazily so the Pallas branch's program never contains them
            # (trusting DCE here is not enough: even dead, they can block
            # in-place DUS on the carried int8 buffers during layout
            # assignment)
            def k_use(k_all=k_all, kvs_all=kvs_all):
                s = jnp.swapaxes(kvs_all[:, 0::2, :], 1, 2)
                return (k_all.reshape(B_, S_all, Hkv_, D_).astype(x.dtype)
                        * s[..., None].astype(x.dtype))

            def v_use(v_all=v_all, kvs_all=kvs_all):
                s = jnp.swapaxes(kvs_all[:, 1::2, :], 1, 2)
                return (v_all.reshape(B_, S_all, Hkv_, D_).astype(x.dtype)
                        * s[..., None].astype(x.dtype))
        else:
            k_all = jax.lax.dynamic_update_slice(
                buf_k, k.astype(buf_k.dtype).reshape(B_, L_, Hkv_ * D_),
                (0, cache_offset, 0))
            v_all = jax.lax.dynamic_update_slice(
                buf_v, v.astype(buf_v.dtype).reshape(B_, L_, Hkv_ * D_),
                (0, cache_offset, 0))
            new_kvs = kv_cache.kv_scale

            def k_use(k_all=k_all):
                return k_all.reshape(B_, S_all, Hkv_, D_).astype(x.dtype)

            def v_use(v_all=v_all):
                return v_all.reshape(B_, S_all, Hkv_, D_).astype(x.dtype)
        new_k = kv_cache.k[:layer_idx] + (k_all,) + kv_cache.k[layer_idx + 1:]
        new_v = kv_cache.v[:layer_idx] + (v_all,) + kv_cache.v[layer_idx + 1:]
        kv_cache = KVCache(k=new_k, v=new_v, valid=kv_cache.valid,
                           kv_scale=new_kvs)
    else:
        def k_use():
            return k

        def v_use():
            return v

    # Decode-step fast path: fused Pallas attention reading the merged-lane
    # cache buffers directly (no transposed cache copies — the XLA einsum
    # materializes [B, Hkv, S, D] copies of BOTH caches every step, which
    # also defeats in-place DUS; see ops/pallas/decode_attention.py).
    on_cpu = jax.default_backend() == "cpu"
    impl = cfg.decode_attn_impl
    # Chunk bound: speculative verify chunks are small (spec_k+1, default
    # 5); past ~16 rows-per-head the block-diagonal expansion's MXU waste
    # stops being free and prefill should use the dense path anyway.
    chunk_ok = 1 < L <= 16
    if (kv_cache is not None and (L == 1 or chunk_ok) and mask is not None
            and impl in ("pallas", "pallas_interpret", "pallas_spmd")
            and _decode_attn_ok(cfg)
            # on CPU the kernel only runs interpreted (~100x slower), so
            # the default "pallas" quietly uses the XLA path there;
            # "pallas_interpret" forces the kernel for parity tests and
            # "pallas_spmd" always engages (its partitioning rules are
            # what mesh tests exercise; interpret mode on CPU)
            and (not on_cpu or impl in ("pallas_interpret",
                                        "pallas_spmd"))):
        if impl == "pallas_spmd":
            # mesh-sharded serving: custom_partitioning rules split the
            # kernel per-device (batch on dp, kv heads on tp) instead of
            # letting the partitioner gather the cache onto every chip
            from mtasr_tpu.ops.pallas import spmd as _spmd
            if kv_cache.kv_scale is not None:
                if L == 1:
                    out = _spmd.decode_attention_int8_spmd(
                        q[:, 0], k_all, v_all, kvs_all, mask[:, 0, 0, :],
                        interpret=on_cpu)[:, None]
                else:
                    out = _spmd.decode_attention_int8_chunk_spmd(
                        q, k_all, v_all, kvs_all, mask[:, 0],
                        interpret=on_cpu)
            else:
                if L == 1:
                    out = _spmd.decode_attention_spmd(
                        q[:, 0], k_all, v_all, mask[:, 0, 0, :],
                        interpret=on_cpu)[:, None]
                else:
                    out = _spmd.decode_attention_chunk_spmd(
                        q, k_all, v_all, mask[:, 0], interpret=on_cpu)
        elif kv_cache.kv_scale is not None:
            # int8 cache: scales fold into scores/probs inside the kernel;
            # the dequantized k_use/v_use closures are never called, so
            # HBM sees only the int8 stream
            from mtasr_tpu.ops.pallas.decode_attention import (
                decode_attention_int8, decode_attention_int8_chunk,
            )
            if L == 1:
                out = decode_attention_int8(
                    q[:, 0], k_all, v_all, kvs_all, mask[:, 0, 0, :],
                    interpret=on_cpu)[:, None]
            else:
                # speculative verify chunk: keep the no-copy cache path
                # (the XLA fallback re-materialized transposed cache
                # copies per layer per verify step — 49 ms vs 8 ms/step
                # at B=256, DESIGN.md round 3e)
                out = decode_attention_int8_chunk(
                    q, k_all, v_all, kvs_all, mask[:, 0],
                    interpret=on_cpu)
        else:
            from mtasr_tpu.ops.pallas.decode_attention import (
                decode_attention, decode_attention_chunk,
            )
            if L == 1:
                out = decode_attention(q[:, 0], k_all, v_all,
                                       mask[:, 0, 0, :],
                                       interpret=on_cpu)[:, None]
            else:
                out = decode_attention_chunk(q, k_all, v_all, mask[:, 0],
                                             interpret=on_cpu)
    else:
        out = dot_product_attention(q, k_use(), v_use(), mask=mask,
                                    scale=D ** -0.5)
    out = out.reshape(B, L, -1)
    ab_o = lora_layer.get("o_proj") if lora_layer is not None else None
    rng_o = (jax.random.fold_in(lora_rng, _LORA_RNG_FOLD["o_proj"])
             if (lora_rng is not None and ab_o is not None) else None)
    out = _lora_linear(p["o_proj"], out, ab_o, lora_scale, rng_o, lora_dropout)
    return out, kv_cache


def _mlp(p: dict, x: jax.Array) -> jax.Array:
    return linear(p["down_proj"],
                  jax.nn.silu(linear(p["gate_proj"], x)) * linear(p["up_proj"], x))


def llama_forward(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,                     # [B, L, H]
    position_ids: jax.Array,                      # [B, L]
    *,
    key_valid_mask: Optional[jax.Array] = None,   # [B, L] (no cache) / [B, Smax]
    kv_cache: Optional[KVCache] = None,
    cache_offset=0,                               # int or traced scalar
    layer_callback: Optional[Callable[[int, jax.Array], jax.Array]] = None,
    compute_logits: bool = True,
    logits_to_keep: int = 0,
    lora: Optional[dict] = None,          # params['decoder_lora'] subtree
    lora_rng: Optional[jax.Array] = None,  # None => no LoRA dropout
    lora_dropout: float = 0.0,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Returns (logits [B, L(or logits_to_keep), V] or hidden, new kv_cache).

    Causality: query at row i (absolute position cache_offset + i) attends to
    key slot j iff j <= cache_offset + i and the slot is valid.
    """
    B, L, H = inputs_embeds.shape
    inv_freq, attn_scaling = compute_rope_freqs(
        cfg.head_dim_, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(jnp.asarray(inv_freq), position_ids, attn_scaling,
                            dtype=inputs_embeds.dtype)

    # Build the attention mask once, shared by all layers.
    S = kv_cache.max_len if kv_cache is not None else L
    j = jnp.arange(S)[None, None, :]
    i_abs = cache_offset + jnp.arange(L)[None, :, None]
    mask = j <= i_abs                                            # [1, L, S]
    if kv_cache is not None:
        valid = jax.lax.dynamic_update_slice(
            kv_cache.valid,
            (key_valid_mask if key_valid_mask is not None
             else jnp.ones((B, L), jnp.bool_)),
            (0, cache_offset))
        # Preserve kv_scale: dropping it here (round-2 bug) made
        # _attention silently take the non-quantized branch and astype-truncate
        # bf16 keys into the int8 buffers — every --kv_quant decode computed
        # garbage attention (VERDICT r2 weak #2).
        kv_cache = KVCache(k=kv_cache.k, v=kv_cache.v, valid=valid,
                           kv_scale=kv_cache.kv_scale)
        mask = mask & valid[:, None, :]
    elif key_valid_mask is not None:
        mask = mask & key_valid_mask[:, None, :]
    mask = mask[:, None, :, :]                                   # [B, 1, L, S]

    hidden = inputs_embeds

    lora_scale = None
    if lora is not None:
        meta = lora["__meta__"]
        lora_scale = (meta["alpha"].astype(jnp.float32)
                      / jnp.maximum(meta["r"].astype(jnp.float32), 1.0))

    # scan_layers: one compiled layer body (halves flagship compile time).
    # Composes with LoRA by stacking the per-layer LoRA trees into the scan
    # xs (round-2 silently fell back to the unrolled loop whenever LoRA was
    # on — exactly the flagship recipe — VERDICT r2 weak #3). Requires a
    # homogeneous LoRA tree (every layer, same proj set); heterogeneous
    # trees (layer-scoped LoRA) fall back with a loud warning.
    use_scan = (cfg.scan_layers and kv_cache is None
                and layer_callback is None)
    scan_lora = None
    if use_scan and lora is not None:
        per_layer = [lora.get(str(i)) for i in range(cfg.num_hidden_layers)]
        if (all(pl is not None for pl in per_layer)
                and len({tuple(sorted(pl)) for pl in per_layer}) == 1):
            scan_lora = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *per_layer)
        else:
            use_scan = False
            import warnings
            warnings.warn(
                "scan_layers=True requested but the LoRA tree is layer-"
                "scoped/heterogeneous; falling back to the unrolled layer "
                "loop (compile time will roughly double).", stacklevel=2)
    if use_scan:
        layer_rngs = None
        if lora_rng is not None and scan_lora is not None:
            layer_rngs = jax.vmap(
                lambda i: jax.random.fold_in(lora_rng, i))(
                    jnp.arange(cfg.num_hidden_layers))

        def scan_layer(hidden, xs):
            lp, ll, lrng = xs
            residual = hidden
            h = rms_norm(hidden, lp["input_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            h, _ = _attention(lp["self_attn"], cfg, h, cos, sin, mask, 0,
                              None, cache_offset,
                              lora_layer=ll, lora_scale=lora_scale,
                              lora_rng=lrng, lora_dropout=lora_dropout)
            hidden = residual + h
            residual = hidden
            h = rms_norm(hidden, lp["post_attention_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            return residual + _mlp(lp["mlp"], h), None

        if cfg.remat:
            # full per-layer remat — see wavlm.py: the dots policy saves the
            # stacked [L, B, T, intermediate] MLP activations and OOMs HBM
            scan_layer = jax.checkpoint(scan_layer)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[params["model"]["layers"][str(i)]
              for i in range(cfg.num_hidden_layers)])
        hidden, _ = jax.lax.scan(scan_layer, hidden,
                                 (stacked, scan_lora, layer_rngs))
        hidden = rms_norm(hidden, params["model"]["norm"]["weight"],
                          cfg.rms_norm_eps)
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if compute_logits:
            return lm_head(params, cfg, hidden), kv_cache
        return hidden, kv_cache

    for idx in range(cfg.num_hidden_layers):
        lp = params["model"]["layers"][str(idx)]
        ll = lora.get(str(idx)) if lora is not None else None
        lrng = (jax.random.fold_in(lora_rng, idx)
                if (lora_rng is not None and ll is not None) else None)

        def layer_fn(lp, ll, hidden, kv_cache, idx=idx, lrng=lrng):
            residual = hidden
            h = rms_norm(hidden, lp["input_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            h, kv_cache = _attention(lp["self_attn"], cfg, h, cos, sin, mask,
                                     idx, kv_cache, cache_offset,
                                     lora_layer=ll, lora_scale=lora_scale,
                                     lora_rng=lrng, lora_dropout=lora_dropout)
            hidden = residual + h
            if layer_callback is not None:
                hidden = layer_callback(idx, hidden)
            residual = hidden
            h = rms_norm(hidden, lp["post_attention_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            return residual + _mlp(lp["mlp"], h), kv_cache

        if cfg.remat and kv_cache is None:
            # gradient checkpointing (reference supports_gradient_checkpointing;
            # here per-layer jax.checkpoint with matmul-output saving)
            layer_fn = jax.checkpoint(layer_fn)
        hidden, kv_cache = layer_fn(lp, ll, hidden, kv_cache)

    hidden = rms_norm(hidden, params["model"]["norm"]["weight"], cfg.rms_norm_eps)
    if logits_to_keep:
        hidden = hidden[:, -logits_to_keep:, :]
    if compute_logits:
        return lm_head(params, cfg, hidden), kv_cache
    return hidden, kv_cache
