"""Flash attention kernel tests (interpreter mode on CPU; the real-TPU run
happens in verification/bench drives)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.ops.attention import dot_product_attention
from mtasr_tpu.ops.pallas.flash_attention import _reference, flash_attention


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2)])
def test_flash_matches_reference_basic(hq, hkv):
    B, T, S, D = 2, 96, 160, 32
    q, k, v = _rand((B, T, hq, D), 0), _rand((B, S, hkv, D), 1), \
        _rand((B, S, hkv, D), 2)
    out = flash_attention(q, k, v, block_q=32, block_k=64, interpret=True)
    ref = _reference(q, k, v, None, None, None, D ** -0.5, False, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_flash_causal_and_kv_lens():
    B, T, S, D, H = 2, 64, 64, 32, 4
    q, k, v = _rand((B, T, H, D), 3), _rand((B, S, H, D), 4), \
        _rand((B, S, H, D), 5)
    kv_lens = jnp.array([64, 40])
    out = flash_attention(q, k, v, kv_lens=kv_lens, causal=True,
                          block_q=32, block_k=32, interpret=True)
    ref = _reference(q, k, v, kv_lens, None, None, D ** -0.5, True, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_flash_relpos_bias_gate():
    B, T, D, H = 2, 80, 32, 4
    q, k, v = _rand((B, T, H, D), 6), _rand((B, T, H, D), 7), \
        _rand((B, T, H, D), 8)
    pos_bias = _rand((H, T, T), 9) * 0.3
    gate = jnp.abs(_rand((B, H, T), 10))
    kv_lens = jnp.array([80, 55])
    out = flash_attention(q, k, v, kv_lens=kv_lens, pos_bias=pos_bias,
                          gate=gate, block_q=32, block_k=32, interpret=True)
    ref = _reference(q, k, v, kv_lens, pos_bias, gate, D ** -0.5, False, 0)
    # rows beyond kv_len of sample 1 attend to nothing in ref too; compare all
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4,
                               atol=3e-5)


def test_flash_non_divisible_lengths():
    B, T, S, D, H = 1, 50, 70, 32, 2
    q, k, v = _rand((B, T, H, D), 11), _rand((B, S, H, D), 12), \
        _rand((B, S, H, D), 13)
    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
    ref = _reference(q, k, v, None, None, None, D ** -0.5, False, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_flash_backward_grads():
    B, T, D, H = 1, 40, 32, 2
    q, k, v = _rand((B, T, H, D), 14), _rand((B, T, H, D), 15), \
        _rand((B, T, H, D), 16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=32,
                                       block_k=32, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, None, None, None, D ** -0.5,
                                  True, 0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)


def test_flash_backward_with_bias_and_kvlens():
    """Full backward parity incl. the gated rel-pos bias grads (dpb, dg) and
    padded keys — the path the WavLM encoder trains through."""
    B, T, D, H = 2, 48, 32, 2
    q, k, v = _rand((B, T, H, D), 20), _rand((B, T, H, D), 21), \
        _rand((B, T, H, D), 22)
    pos_bias = _rand((H, T, T), 23) * 0.3
    gate = jnp.abs(_rand((B, H, T), 24))
    kv_lens = jnp.array([48, 31])

    def loss_flash(q, k, v, pb, g):
        return jnp.sum(flash_attention(
            q, k, v, kv_lens=kv_lens, pos_bias=pb, gate=g,
            block_q=32, block_k=32, interpret=True) ** 2)

    def loss_ref(q, k, v, pb, g):
        return jnp.sum(_reference(q, k, v, kv_lens, pb, g, D ** -0.5,
                                  False, 0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_bias,
                                                       gate)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_bias, gate)
    for name, a, b in zip(("dq", "dk", "dv", "dpb", "dg"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                                   atol=3e-4, err_msg=name)


def test_flash_backward_gqa_ragged():
    """GQA group-summed dk/dv with non-divisible T/S."""
    B, T, S, D, Hq, Hkv = 2, 50, 70, 32, 4, 2
    q, k, v = _rand((B, T, Hq, D), 25), _rand((B, S, Hkv, D), 26), \
        _rand((B, S, Hkv, D), 27)
    kv_lens = jnp.array([70, 44])

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lens=kv_lens, causal=True,
                                       q_offset=S - T, block_q=32,
                                       block_k=32, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, kv_lens, None, None, D ** -0.5,
                                  True, S - T) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                                   atol=3e-4, err_msg=name)
