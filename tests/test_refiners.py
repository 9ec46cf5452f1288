"""Refiner tests: MHA packed-projection parity vs torch, band masks vs the
reference's loop construction, resample vs torch interpolate, extractor
semantics, and bridge integration in the composite."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.models.refiners import (
    band_mask, build_guidance_from_ctc_logits, continuous_refiner,
    extractor_concat_nng, extractor_concat_softmax, init_continuous_refiner,
    init_extractor_concat, init_mha_params, mha, resample_to_len_1d,
)
from mtasr_tpu.utils.torch_interop import convert_torch_state_dict

torch = pytest.importorskip("torch")


def test_mha_matches_torch_multihead_attention():
    torch.manual_seed(0)
    E, H, B, T, S = 32, 4, 2, 7, 11
    m = torch.nn.MultiheadAttention(E, H, batch_first=True)
    m.eval()
    p = convert_torch_state_dict(m.state_dict())
    q = np.random.default_rng(0).standard_normal((B, T, E)).astype(np.float32)
    kv = np.random.default_rng(1).standard_normal((B, S, E)).astype(np.float32)
    mask = np.asarray(band_mask(T, S, 3))
    add_mask = np.where(mask, 0.0, float("-inf")).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(q), torch.tensor(kv), torch.tensor(kv),
                attn_mask=torch.tensor(add_mask), need_weights=False)[0]
    ours = mha(p, jnp.asarray(q), jnp.asarray(kv), H,
               jnp.asarray(mask)[None, None])
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_band_mask_matches_reference_loop():
    T, band = 13, 4
    ref = np.full((T, T), False)
    for t in range(T):
        ref[t, max(0, t - band):min(T, t + band + 1)] = True
    np.testing.assert_array_equal(np.asarray(band_mask(T, T, band)), ref)


@pytest.mark.parametrize("mode", ["nearest", "linear"])
def test_resample_matches_torch_interpolate(mode):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 17)).astype(np.float32)
    for Tt in (9, 17, 29):
        ours = np.asarray(resample_to_len_1d(jnp.asarray(x), Tt, mode))
        tx = torch.tensor(x).unsqueeze(1)
        ref = torch.nn.functional.interpolate(
            tx, size=Tt, mode=("nearest" if mode == "nearest" else "linear"),
            align_corners=None if mode == "nearest" else False)
        np.testing.assert_allclose(ours, ref.squeeze(1).numpy(), rtol=1e-5,
                                   atol=1e-6)


def test_guidance_signals():
    rng = np.random.default_rng(3)
    K, B, T, V = 2, 2, 10, 6
    logits = [jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
              for _ in range(K)]
    A_list, H_list, A_g, H_g = build_guidance_from_ctc_logits(
        logits, blank_id=V - 1, t_target=15)
    assert len(A_list) == K and A_list[0].shape == (B, 15)
    assert np.all(np.asarray(A_g) >= 0) and np.all(np.asarray(A_g) <= 1)
    assert np.all(np.asarray(H_g) >= 0)


def test_extractors_shapes_and_routing():
    rng = np.random.default_rng(4)
    B, Tm, D, Dm, K, V = 2, 12, 8, 16, 2, 10
    x = jnp.asarray(rng.standard_normal((B, Tm, D)), jnp.float32)
    # logits that put all mass on non-blank for speaker 0, blank for speaker 1
    lg0 = jnp.full((B, Tm, V), -10.0).at[..., 0].set(10.0)
    lg1 = jnp.full((B, Tm, V), -10.0).at[..., V - 1].set(10.0)
    p = init_extractor_concat(jax.random.key(0), D, Dm, K, use_repair=False,
                              use_stream_ln=False)
    out = extractor_concat_softmax(p, x, V - 1, [lg0, lg1], K)
    assert out.shape == (B, K * Tm, Dm)
    X = np.asarray(jnp.einsum("btd,od->bto", x, p["proj_in"]["weight"])
                   + p["proj_in"]["bias"])
    s0 = np.asarray(out)[:, :Tm] - np.asarray(p["spk_tags"][0])
    s1 = np.asarray(out)[:, Tm:] - np.asarray(p["spk_tags"][1])
    # soft routing: W = softmax([A0=1, A1=0]) per frame
    w0 = np.exp(1.0) / (np.exp(1.0) + 1.0)
    np.testing.assert_allclose(s0, w0 * X, atol=1e-3)
    np.testing.assert_allclose(s1, (1 - w0) * X, atol=1e-3)

    out_nng = extractor_concat_nng(p, x, V - 1, [lg0, lg1], K)
    assert out_nng.shape == (B, K * Tm, Dm)


def test_continuous_refiner_runs_and_grads():
    rng = np.random.default_rng(5)
    B, T, D, Dm = 2, 10, 8, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    p = init_continuous_refiner(jax.random.key(1), D, Dm, n_layers=1, K_spk=2)
    A = jnp.ones((B, T)) * 0.5
    out = continuous_refiner(p, x, A, A, [A, A], n_heads=4)
    assert out.shape == (B, T, Dm)

    def loss(pp):
        return jnp.sum(continuous_refiner(pp, x, A, A, [A, A], n_heads=4) ** 2)
    g = jax.grad(loss)(p)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


def test_softmax_bridge_in_composite():
    from tests.test_composite import make_batch, tiny_cfg
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True, ctc_bridge=True,
                   ctc_bridge_type="softmax")
    from mtasr_tpu.models.speech_encoder_decoder import (
        init_model_params, model_forward,
    )
    params = init_model_params(jax.random.key(0), cfg)
    assert "ctc_extractor_concat" in params
    wav, amask, arr = make_batch(cfg)
    out = model_forward(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                        jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
                        ce_labels=jnp.asarray(arr["ce_labels"]),
                        label_spks=jnp.asarray(arr["label_spks"]),
                        label_spk_lens=jnp.asarray(arr["label_spk_lens"]))
    assert np.isfinite(float(out.loss))
    # speech memory is K*T0 frames long now
    S = wav.shape[1]
    T0 = cfg.encoder.conv_output_length(S)
    L = arr["decoder_input_ids"].shape[1]
    assert out.logits.shape[1] == 2 * T0 + L
