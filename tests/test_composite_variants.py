"""Composite-model variant coverage: every cross-attention adapter kind x
memory feature, the CTC frame-refine path, 3-talker + PIT, and gradient flow
into the adapters."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.models.speech_encoder_decoder import (
    init_model_params, model_forward,
)
from tests.test_composite import make_batch, tiny_cfg


def _forward(cfg, params, seed=0, B=2, use_pit=False):
    wav, amask, arr = make_batch(cfg, B=B, seed=seed)
    out = model_forward(
        params, cfg, jnp.asarray(wav), jnp.asarray(amask),
        jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
        ce_labels=jnp.asarray(arr["ce_labels"]),
        label_spks=jnp.asarray(arr["label_spks"]),
        label_spk_lens=jnp.asarray(arr["label_spk_lens"]),
        use_pit=use_pit)
    return out, (wav, amask, arr)


@pytest.mark.parametrize("kind", ["tiny", "gatetiny", "ctcaware",
                                  "adapgatetiny"])
@pytest.mark.parametrize("feature", ["mix", "sep"])
def test_adapter_kinds_in_composite(kind, feature):
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True,
                   decoder_cross_attention=True,
                   decoder_cross_attention_type=kind,
                   decoder_cross_attention_feature=feature,
                   cross_attn_dim=16)
    params = init_model_params(jax.random.key(0), cfg)
    assert "cross_att_adap" in params
    out, _ = _forward(cfg, params)
    assert np.isfinite(float(out.loss))

    # adapters influence the CE logits: zeroing their output projection
    # must change the loss
    import copy
    p2 = copy.deepcopy(params)
    for i in p2["cross_att_adap"]:
        p2["cross_att_adap"][i]["out_proj"]["weight"] = \
            jnp.zeros_like(p2["cross_att_adap"][i]["out_proj"]["weight"])
        if kind == "adapgatetiny":
            p2["cross_att_adap"][i]["out_lora"]["lora_B"] = \
                jnp.zeros_like(p2["cross_att_adap"][i]["out_lora"]["lora_B"])
    out2, _ = _forward(cfg, p2)
    assert abs(float(out.loss) - float(out2.loss)) > 1e-6


def test_adapter_ctctoken_feature():
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True,
                   decoder_cross_attention=True,
                   decoder_cross_attention_type="ctcaware",
                   decoder_cross_attention_feature="ctctoken",
                   cross_attn_dim=16)
    params = init_model_params(jax.random.key(1), cfg)
    out, _ = _forward(cfg, params)
    assert np.isfinite(float(out.loss))


def test_adapter_gradients_flow():
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True,
                   decoder_cross_attention=True,
                   decoder_cross_attention_type="adapgatetiny",
                   cross_attn_dim=16, r_max=4)
    params = init_model_params(jax.random.key(2), cfg)
    wav, amask, arr = make_batch(cfg, seed=3)

    def loss_fn(p):
        return model_forward(
            p, cfg, jnp.asarray(wav), jnp.asarray(amask),
            jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
            ce_labels=jnp.asarray(arr["ce_labels"]),
            label_spks=jnp.asarray(arr["label_spks"]),
            label_spk_lens=jnp.asarray(arr["label_spk_lens"])).loss

    grads = jax.grad(loss_fn)(params)
    g_ad = grads["cross_att_adap"]["0"]
    # base projections AND LoRA factors get gradients
    assert float(jnp.abs(g_ad["q_proj"]["weight"]).max()) > 0
    assert float(jnp.abs(g_ad["q_lora"]["lora_B"]).max()) > 0
    assert float(jnp.abs(g_ad["gate_logit"]).max()) > 0


def test_talker_refine_path():
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True,
                   talker_ctc_refine=True)
    params = init_model_params(jax.random.key(3), cfg)
    assert "serilized_refine" in params
    out, _ = _forward(cfg, params)
    assert np.isfinite(float(out.loss))


def test_three_talkers_with_pit():
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True, talker_numbers=3)
    params = init_model_params(jax.random.key(4), cfg)
    # build 3-speaker labels
    rng = np.random.default_rng(5)
    from mtasr_tpu.data.labels import build_training_arrays
    from tests.test_composite import BOS, EOS, PAD, SC
    B = 2
    rows = []
    for b in range(B):
        row = (list(rng.integers(3, 40, 3)) + [SC]
               + list(rng.integers(3, 40, 4)) + [SC]
               + list(rng.integers(3, 40, 3)))
        rows.append(row)
    L = max(len(r) for r in rows)
    labels = np.full((B, L), -100, np.int64)
    for b, r in enumerate(rows):
        labels[b, :len(r)] = r
    arr = build_training_arrays(labels, pad_token_id=PAD,
                                decoder_start_token_id=BOS, eos_token_id=EOS,
                                sc_token_id=SC, talker_numbers=3)
    assert arr["label_spks"].shape[0] == 3
    wav = rng.standard_normal((B, 8000)).astype(np.float32)
    amask = np.ones((B, 8000), np.int32)
    for use_pit in (False, True):
        out = model_forward(
            params, cfg, jnp.asarray(wav), jnp.asarray(amask),
            jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
            ce_labels=jnp.asarray(arr["ce_labels"]),
            label_spks=jnp.asarray(arr["label_spks"]),
            label_spk_lens=jnp.asarray(arr["label_spk_lens"]),
            use_pit=use_pit)
        assert np.isfinite(float(out.loss))
        if use_pit:
            assert "best_perm" in out.aux
            # PIT loss <= fixed-assignment loss
            out_fixed = model_forward(
                params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
                ce_labels=jnp.asarray(arr["ce_labels"]),
                label_spks=jnp.asarray(arr["label_spks"]),
                label_spk_lens=jnp.asarray(arr["label_spk_lens"]))
            assert float(out.aux["loss_ctc"]) <= \
                float(out_fixed.aux["loss_ctc"]) + 1e-4


@pytest.mark.parametrize("bridge", ["raw", "ctcprompt"])
def test_ctc_bridge_types(bridge):
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True, ctc_bridge=True,
                   ctc_bridge_type=bridge)
    params = init_model_params(jax.random.key(7), cfg)
    out, (wav, amask, arr) = _forward(cfg, params, seed=13)
    assert np.isfinite(float(out.loss))
    S = wav.shape[1]
    T0 = cfg.encoder.conv_output_length(S)
    T8 = cfg.encoder.adapter_output_length(T0)
    L = arr["decoder_input_ids"].shape[1]
    if bridge == "raw":
        # concat separated 50Hz streams -> encoder adapter (8x) -> memory
        K = cfg.talker_numbers
        T_mem = cfg.encoder.adapter_output_length(K * T0)
        assert out.logits.shape[1] == T_mem + L
    else:
        # collapsed CTC prefix (64/head default cap) prepended to speech
        assert out.logits.shape[1] == 2 * 64 + T8 + L

    # generation works through the bridge
    from mtasr_tpu.generate import generate
    g = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                 max_new_tokens=4)
    assert np.asarray(g.sequences).shape == (wav.shape[0], 4)
