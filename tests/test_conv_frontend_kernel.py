"""Fused conv0 Pallas kernel + fast-gelu parity (interpret mode on CPU).

The kernel replaces the WavLM frontend's first conv layer
(/root/reference/models/modeling_wavlm.py conv stack, k=10/s=5/C_in=1);
golden is the identical-math XLA composition. The only intended numeric
difference is the polynomial erf in the fused gelu (<=1 bf16 ulp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtasr_tpu.models.layers import fast_gelu, gelu, resolve_act
from mtasr_tpu.ops.pallas.conv_frontend import (
    _conv0_xla, conv0_fused, supported,
)

B, S, O, K, STRIDE = 4, 1280, 512, 10, 5


def _inputs(bias=True, dtype=jnp.float32):
    k = jax.random.PRNGKey(0)
    wave = jax.random.normal(k, (B, S), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (O, 1, K), jnp.float32) * 0.2
    b = (jax.random.normal(jax.random.PRNGKey(2), (O,), jnp.float32) * 0.05
         if bias else None)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(3), (O,))
    beta = 0.05 * jax.random.normal(jax.random.PRNGKey(4), (O,))
    return wave, w, b, gamma, beta


def test_supported_geometry():
    assert supported(10, 5, 1, 512, 128, 160000)
    assert not supported(3, 2, 512, 512, 128, 160000)   # layer 1 geometry
    assert not supported(10, 5, 1, 512, 128, 160001)    # unaligned S
    # 128-aligned but the last 128-frame tile's 640-sample input block
    # would overrun the array (DMA pads with undefined values and the
    # selection matmul contracts over the whole block -> NaN poison):
    assert not supported(10, 5, 1, 512, 128, 768)
    assert not supported(10, 5, 1, 512, 128, 3968)


def test_conv0_fused_unsupported_s_falls_back():
    """A direct conv0_fused call with an unaligned S must take the XLA
    fallback (never a partially out-of-bounds Pallas grid): finite output,
    exact parity with the golden composition."""
    wave, w, b, gamma, beta = _inputs()
    wave = jax.random.normal(jax.random.PRNGKey(9), (B, 3968), jnp.float32)
    out = conv0_fused(wave, w, b, gamma, beta, stride=STRIDE,
                      fuse_ln=True, fuse_act=True)
    ref = _conv0_xla(wave, w, b, gamma, beta, STRIDE, 1e-5, True, True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bias", [True, False])
def test_conv0_fused_ln_gelu_parity(bias):
    wave, w, b, gamma, beta = _inputs(bias)
    out = conv0_fused(wave, w, b, gamma, beta, stride=STRIDE,
                      fuse_ln=True, fuse_act=True, interpret=True)
    b_arr = b if b is not None else jnp.zeros((O,), jnp.float32)
    ref = _conv0_xla(wave, w, b_arr, gamma, beta, STRIDE, 1e-5, True, True)
    assert out.shape == (B, (S - K) // STRIDE + 1, O)
    # poly-erf gelu vs exact: abs err bound 2e-3 at this activation scale
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_conv0_fused_conv_only_parity():
    """fuse_ln=False (group-norm configs): raw conv + bias is exact."""
    wave, w, b, gamma, beta = _inputs()
    out = conv0_fused(wave, w, b, None, None, stride=STRIDE,
                      fuse_ln=False, fuse_act=False, interpret=True)
    ref = _conv0_xla(wave, w, b, jnp.ones((O,)), jnp.zeros((O,)),
                     STRIDE, 1e-5, False, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv0_fused_grads_match_xla():
    """custom_vjp backward IS the XLA vjp — with the same cotangent the
    grads match the XLA composition's exactly (both linearize the exact
    function at the same primals)."""
    wave, w, b, gamma, beta = _inputs()

    def f_kernel(w, b, gamma, beta):
        return conv0_fused(wave, w, b, gamma, beta, stride=STRIDE,
                           fuse_ln=True, fuse_act=True, interpret=True)

    def f_xla(w, b, gamma, beta):
        return _conv0_xla(wave, w, b, gamma, beta, STRIDE, 1e-5, True, True)

    yk, vjp_k = jax.vjp(f_kernel, w, b, gamma, beta)
    yx, vjp_x = jax.vjp(f_xla, w, b, gamma, beta)
    ct = jax.random.normal(jax.random.PRNGKey(7), yk.shape, yk.dtype)
    for a, r in zip(vjp_k(ct), vjp_x(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_feature_encoder_pallas_matches_xla():
    from mtasr_tpu.config import WavLMConfig
    from mtasr_tpu.models import wavlm
    import dataclasses
    cfg = WavLMConfig(feat_extract_norm="layer", conv_bias=True)
    params = wavlm.init_wavlm_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(5), (2, 2560), jnp.float32)
    ref = wavlm.feature_encoder(
        params["feature_extractor"],
        dataclasses.replace(cfg, conv0_impl="xla"), wave)
    out = wavlm.feature_encoder(
        params["feature_extractor"],
        dataclasses.replace(cfg, conv0_impl="pallas"), wave)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_fast_gelu_accuracy():
    x = jnp.linspace(-8.0, 8.0, 100001, dtype=jnp.float32)
    exact = gelu(x)
    approx = fast_gelu(x)
    assert float(jnp.max(jnp.abs(approx - exact))) < 1.5e-3
    # after bf16 rounding: <= 1 ulp at |gelu| ~ 4
    d = jnp.abs(approx.astype(jnp.bfloat16).astype(jnp.float32)
                - exact.astype(jnp.bfloat16).astype(jnp.float32))
    assert float(jnp.max(d)) <= 0.03125 + 1e-9


def test_resolve_act_cpu_is_exact():
    # on CPU (the test backend) "auto" must resolve to the exact erf path
    assert resolve_act("gelu", "auto") is gelu
    assert resolve_act("gelu", "fast") is fast_gelu
    assert resolve_act("gelu", "exact") is gelu
    assert resolve_act("silu", "auto") is jax.nn.silu
