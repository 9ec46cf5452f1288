"""Pallas CTC kernel vs the lax.scan implementation (itself golden-tested
against torch): losses and gradients, including degenerate cases."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.ops.ctc import ctc_loss
from mtasr_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas


def _case(seed, B=3, T=37, V=11, L=9):
    rng = np.random.default_rng(seed)
    blank = V - 1
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ilens = rng.integers(L + 4, T + 1, size=B).astype(np.int32)
    olens = rng.integers(1, L + 1, size=B).astype(np.int32)
    labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)
    return log_probs, jnp.asarray(ilens), jnp.asarray(labels), \
        jnp.asarray(olens), blank


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_ctc_matches_scan(seed):
    lp, il, lab, ol, blank = _case(seed)
    ours = ctc_loss_pallas(lp, il, lab, ol, blank, True)
    ref = ctc_loss(lp, il, lab, ol, blank)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_pallas_ctc_degenerate():
    # zero-length labels + impossible alignments
    B, T, V, L = 3, 12, 7, 6
    blank = V - 1
    lp = jax.nn.log_softmax(jnp.zeros((B, T, V)), -1)
    il = jnp.array([12, 3, 12])
    ol = jnp.array([0, 6, 2])       # sample 1 impossible (needs >= 11)
    lab = jnp.tile(jnp.arange(L)[None, :] % (V - 1), (B, 1)).astype(jnp.int32)
    ours = np.asarray(ctc_loss_pallas(lp, il, lab, ol, blank, True))
    ref = np.asarray(ctc_loss(lp, il, lab, ol, blank))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    assert ours[1] == 0.0  # zero_infinity


@pytest.mark.parametrize("seed", [3, 4])
def test_pallas_ctc_grad_matches_scan(seed):
    lp, il, lab, ol, blank = _case(seed, B=2, T=20, V=8, L=5)

    def loss_pallas(x):
        return jnp.sum(ctc_loss_pallas(x, il, lab, ol, blank, True))

    def loss_scan(x):
        return jnp.sum(ctc_loss(x, il, lab, ol, blank))

    gp = np.asarray(jax.grad(loss_pallas)(lp))
    gs = np.asarray(jax.grad(loss_scan)(lp))
    np.testing.assert_allclose(gp, gs, rtol=1e-3, atol=1e-4)


def test_pallas_ctc_grad_zero_for_impossible():
    B, T, V, L = 1, 4, 6, 5
    blank = V - 1
    lp = jax.nn.log_softmax(jnp.zeros((B, T, V)), -1)
    il = jnp.array([4])
    ol = jnp.array([5])
    lab = jnp.ones((B, L), jnp.int32)

    g = jax.grad(lambda x: jnp.sum(ctc_loss_pallas(x, il, lab, ol, blank,
                                                   True)))(lp)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
