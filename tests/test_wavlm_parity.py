"""Numerical parity: our JAX WavLM vs the installed HF torch WavLM, with
identical (randomly initialized) weights. Covers conv frontend, rel-pos
transformer (both stable-LN and post-LN variants), feature masks, and the
adapter incl. the 4x intermediate tap."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.config import WavLMConfig
from mtasr_tpu.models.wavlm import (
    feature_vector_attention_mask, wavlm_forward,
)
from mtasr_tpu.utils.torch_interop import convert_torch_state_dict

torch = pytest.importorskip("torch")
from transformers import WavLMConfig as HFWavLMConfig  # noqa: E402
from transformers import WavLMModel as HFWavLMModel  # noqa: E402


def _make_pair(do_stable_layer_norm, feat_extract_norm, seed=0,
               mask_time_prob=0.0):
    kw = dict(
        vocab_size=32, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=72,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        conv_bias=(feat_extract_norm == "layer"),
        num_buckets=32, max_bucket_distance=50,
        do_stable_layer_norm=do_stable_layer_norm,
        feat_extract_norm=feat_extract_norm,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        add_adapter=True, adapter_kernel_size=3, adapter_stride=2,
        num_adapter_layers=3, output_hidden_size=24,
        mask_time_prob=mask_time_prob, mask_feature_prob=0.0,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(seed)
    hf_cfg = HFWavLMConfig(num_feat_extract_layers=2, **kw)
    hf = HFWavLMModel(hf_cfg).eval()
    ours_cfg = WavLMConfig(**kw)
    params = convert_torch_state_dict(hf.state_dict())
    return hf, ours_cfg, params


@pytest.mark.parametrize("stable,norm", [(True, "layer"), (False, "group")])
def test_wavlm_forward_parity(stable, norm):
    hf, cfg, params = _make_pair(stable, norm)
    rng = np.random.default_rng(1)
    B, S = 2, 3200
    wav = rng.standard_normal((B, S)).astype(np.float32)
    lens = np.array([S, S - 700])
    amask = (np.arange(S)[None, :] < lens[:, None]).astype(np.int64)

    with torch.no_grad():
        hf_out = hf(torch.tensor(wav), attention_mask=torch.tensor(amask),
                    output_hidden_states=True)

    out = wavlm_forward(params, cfg, jnp.asarray(wav), jnp.asarray(amask))

    # post-adapter (8x) final features
    np.testing.assert_allclose(np.asarray(out.last_hidden_state),
                               hf_out.last_hidden_state.numpy(),
                               rtol=1e-4, atol=2e-4)
    # pre-adapter 50 Hz features (separator/CTC input)
    np.testing.assert_allclose(np.asarray(out.encoder_hidden_state),
                               hf_out.hidden_states[-1].numpy(),
                               rtol=1e-4, atol=2e-4)
    # 4x intermediate tap == manually running the first 2 HF adapter layers
    with torch.no_grad():
        h = hf_out.hidden_states[-1]
        if hf.adapter.proj is not None:
            h = hf.adapter.proj_layer_norm(hf.adapter.proj(h))
        h = h.transpose(1, 2)
        h = hf.adapter.layers[0](h)
        h = hf.adapter.layers[1](h)
        tap_ref = h.transpose(1, 2).numpy()
    np.testing.assert_allclose(np.asarray(out.wavlm_down_hidden_states),
                               tap_ref, rtol=1e-4, atol=2e-4)


def test_feature_masks_match_reference_arithmetic():
    """Reference mask helpers: _x0 (conv-only, CTC), _x4 (adapter-1), full
    (modeling_wavlm.py:508-577)."""
    hf, cfg, params = _make_pair(True, "layer")
    S = 3200
    lens = np.array([3200, 2500, 1000])
    amask = (np.arange(S)[None, :] < lens[:, None]).astype(np.int64)
    t_amask = torch.tensor(amask)

    T0 = cfg.conv_output_length(S)
    ours_x0 = np.asarray(feature_vector_attention_mask(
        cfg, T0, jnp.asarray(amask), num_adapter_layers=0))
    ref_x0 = hf._get_feature_vector_attention_mask(
        T0, t_amask, add_adapter=False).numpy()
    np.testing.assert_array_equal(ours_x0, ref_x0.astype(bool))

    T_full = cfg.adapter_output_length(T0)
    ours_full = np.asarray(feature_vector_attention_mask(
        cfg, T_full, jnp.asarray(amask)))
    ref_full = hf._get_feature_vector_attention_mask(
        T_full, t_amask, add_adapter=True).numpy()
    np.testing.assert_array_equal(ours_full, ref_full.astype(bool))

    # x4 variant (num_adapter_layers - 1) — reference-only helper; check
    # against explicit arithmetic
    T4 = cfg.adapter_output_length(T0, 2)
    ours_x4 = np.asarray(feature_vector_attention_mask(
        cfg, T4, jnp.asarray(amask), num_adapter_layers=2))
    conv_lens = np.asarray([cfg.conv_output_length(l) for l in lens])
    for _ in range(2):
        conv_lens = (conv_lens - 1) // 2 + 1
    ref_x4 = np.arange(T4)[None, :] < np.minimum(conv_lens, T4)[:, None]
    np.testing.assert_array_equal(ours_x4, ref_x4)


def test_spec_augment_mask_application():
    hf, cfg, params = _make_pair(True, "layer", mask_time_prob=0.05)
    rng = np.random.default_rng(2)
    wav = rng.standard_normal((1, 3200)).astype(np.float32)
    T0 = cfg.conv_output_length(3200)
    mask_t = np.zeros((1, T0), bool)
    mask_t[0, 3:7] = True
    out = wavlm_forward(params, cfg, jnp.asarray(wav),
                        mask_time_indices=jnp.asarray(mask_t))
    with torch.no_grad():
        ref = hf(torch.tensor(wav),
                 mask_time_indices=torch.tensor(mask_t)).last_hidden_state
    np.testing.assert_allclose(np.asarray(out.last_hidden_state), ref.numpy(),
                               rtol=1e-4, atol=2e-4)
