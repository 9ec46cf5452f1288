"""Fused chunked CTC-from-hidden: loss + gradients (d hs, d W, d b) must
match the naive materializing path exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.ops.ctc import ctc_loss
from mtasr_tpu.ops.ctc_fused import ctc_loss_from_hidden


def _case(seed, B=3, T=50, D=16, V=23, L=9):
    rng = np.random.default_rng(seed)
    hs = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((V, D)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
    il = jnp.asarray(rng.integers(L + 5, T + 1, B), jnp.int32)
    ol = jnp.asarray(rng.integers(1, L + 1, B), jnp.int32)
    lab = jnp.asarray(rng.integers(0, V - 1, (B, L)), jnp.int32)
    return hs, w, b, il, lab, ol, V - 1


def _naive(hs, w, b, il, lab, ol, blank):
    logits = jnp.einsum("btd,vd->btv", hs, w) + b
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return ctc_loss(lp, il, lab, ol, blank)


@pytest.mark.parametrize("seed,chunk", [(0, 16), (1, 50), (2, 7)])
def test_fused_loss_matches_naive(seed, chunk):
    hs, w, b, il, lab, ol, blank = _case(seed)
    fused = ctc_loss_from_hidden(hs, w, b, il, lab, ol, blank, chunk)
    naive = _naive(hs, w, b, il, lab, ol, blank)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [3, 4])
def test_fused_grads_match_naive(seed):
    hs, w, b, il, lab, ol, blank = _case(seed, B=2, T=30, D=8, V=12, L=5)

    def lf(hs, w, b):
        return jnp.sum(ctc_loss_from_hidden(hs, w, b, il, lab, ol, blank, 8))

    def ln(hs, w, b):
        return jnp.sum(_naive(hs, w, b, il, lab, ol, blank))

    gf = jax.grad(lf, argnums=(0, 1, 2))(hs, w, b)
    gn = jax.grad(ln, argnums=(0, 1, 2))(hs, w, b)
    for a, bb, name in zip(gf, gn, "hs w b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-3,
                                   atol=1e-4, err_msg=name)


def test_fused_zero_infinity_zero_grads():
    hs, w, b, il, lab, ol, blank = _case(5, B=2, T=12, D=8, V=12, L=5)
    il = jnp.array([3, 6])   # sample 0 impossible for ol=5
    ol = jnp.array([5, 2])
    loss = ctc_loss_from_hidden(hs, w, b, il, lab, ol, blank, 4)
    assert float(loss[0]) == 0.0

    g = jax.grad(lambda h: jnp.sum(
        ctc_loss_from_hidden(h, w, b, il, lab, ol, blank, 4)))(hs)
    np.testing.assert_allclose(np.asarray(g[0]), 0.0, atol=1e-6)
    assert np.abs(np.asarray(g[1])).max() > 0


def test_fused_empty_labels():
    hs, w, b, il, lab, ol, blank = _case(6, B=2, T=20, D=8, V=12, L=4)
    ol = jnp.array([0, 3])
    fused = ctc_loss_from_hidden(hs, w, b, il, lab, ol, blank, 8)
    naive = _naive(hs, w, b, il, lab, ol, blank)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-4, atol=1e-4)
