"""Streaming safetensors -> int8 serving load (utils/model_io.py::
load_model_quantized): per-tensor host read -> host quantize -> device put,
never materializing the bf16 decoder — the pathway a real 8B checkpoint
needs to serve on one 16 GB chip (reference loads real checkpoints via
from_pretrained, src/model_loader.py:26-51; serving them at 8B is only
possible quantized).

Pins: (1) exact int8/scale parity with the on-device
quantize_decoder_for_serving path, (2) tied-embeddings lm_head
materialization, (3) LoRA checkpoints refuse to stream, (4) generate on a
streamed tree == generate on a legacy-quantized tree, token for token.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.generate import generate
from mtasr_tpu.models.speech_encoder_decoder import init_model_params
from mtasr_tpu.utils.model_io import (
    load_model, load_model_quantized, save_model,
)
from mtasr_tpu.utils.quantize import quantize_decoder_for_serving
from mtasr_tpu.utils.torch_interop import tree_to_flat
from tests.test_composite import make_batch, tiny_cfg


def _big_dec_cfg():
    # decoder dims >= min_out_dim so the serving quantizer targets them
    cfg = tiny_cfg(train_mode="attention")
    cfg.decoder.hidden_size = 256
    cfg.decoder.intermediate_size = 512
    cfg.decoder.num_attention_heads = 4
    cfg.decoder.num_key_value_heads = 2
    cfg.decoder.head_dim = 64
    cfg.decoder.vocab_size = 512
    return cfg


@pytest.fixture(scope="module")
def saved_dir(tmp_path_factory):
    cfg = _big_dec_cfg()
    params = init_model_params(jax.random.key(0), cfg)
    d = tmp_path_factory.mktemp("model")
    save_model(str(d), cfg, params)
    return str(d), cfg, params


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_streamed_matches_device_quantize(saved_dir, mode):
    d, cfg, params = saved_dir
    _, q_stream = load_model_quantized(d, mode=mode)
    q_legacy = quantize_decoder_for_serving(load_model(d)[1], mode)

    fs = tree_to_flat(q_stream["decoder"])
    fl = tree_to_flat(q_legacy["decoder"])
    assert set(fs) == set(fl), (set(fs) ^ set(fl))
    wkey = ".weight_q8a8" if mode == "w8a8" else ".weight_q8"
    n_q = 0
    for k in fs:
        a, b = np.asarray(fs[k]), np.asarray(fl[k])
        if k.endswith(wkey):
            # int8 codes must be IDENTICAL (same f32 math host vs device)
            np.testing.assert_array_equal(a, b), k
            n_q += 1
        elif k.endswith(".scale"):
            np.testing.assert_allclose(a, b, rtol=1e-6)
        else:
            # bf16 serving cast vs device f32: compare at bf16 resolution
            np.testing.assert_allclose(a.astype(np.float32),
                                       b.astype(np.float32),
                                       rtol=8e-3, atol=1e-6)
    # 2 layers x (q/o + gate/up/down) + lm_head — k/v (out_dim 128) fall
    # under min_out_dim=256 on BOTH paths
    assert n_q == 2 * 5 + 1, n_q


def test_streamed_tied_embeddings_lm_head(saved_dir, tmp_path):
    d, cfg, params = saved_dir
    tied = {k: v for k, v in params.items()}
    tied["decoder"] = {"model": params["decoder"]["model"]}  # drop lm_head
    save_model(str(tmp_path), cfg, tied)
    _, q = load_model_quantized(str(tmp_path), mode="w8a8")
    assert "weight_q8a8" in q["decoder"]["lm_head"]
    emb = np.asarray(params["decoder"]["model"]["embed_tokens"]["weight"],
                     np.float32)
    scale = np.maximum(np.abs(emb).max(axis=1), 127e-12) / 127.0
    np.testing.assert_allclose(
        np.asarray(q["decoder"]["lm_head"]["scale"]), scale, rtol=1e-6)


def test_streamed_refuses_lora(saved_dir, tmp_path):
    d, cfg, params = saved_dir
    with_lora = dict(params)
    with_lora["decoder_lora"] = {"layers": {"0": {"self_attn": {"q_proj": {
        "A": jnp.zeros((4, 256)), "B": jnp.zeros((256, 4))}}}}}
    save_model(str(tmp_path), cfg, with_lora)
    with pytest.raises(ValueError, match="merge"):
        load_model_quantized(str(tmp_path), mode="w8a8")


def test_streamed_generate_token_identity(saved_dir):
    d, cfg, params = saved_dir
    _, q_stream = load_model_quantized(d, mode="w8a8")
    q_legacy = quantize_decoder_for_serving(load_model(d)[1], "w8a8")
    wav, amask, _ = make_batch(cfg, B=2, seed=7)
    out_s = generate(q_stream, cfg, jnp.asarray(wav), jnp.asarray(amask),
                     max_new_tokens=8)
    out_l = generate(q_legacy, cfg, jnp.asarray(wav), jnp.asarray(amask),
                     max_new_tokens=8)
    # identical int8 weights; the only numeric delta is bf16-cast glue
    # (enc/embed) vs f32 — argmax token streams should agree everywhere
    agree = float(np.mean(np.asarray(out_s.sequences) == np.asarray(out_l.sequences)))
    assert agree >= 0.95, agree
