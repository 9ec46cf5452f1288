"""Experimental-module coverage (reference-dead code, kept for inventory
completeness): sparse-slot bridge, frame-guided extractor, shared-core
adapter wrappers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.models.adapters import (
    init_shared_core_params, shared_core_forward,
)
from mtasr_tpu.models.refiners import (
    extractor_concat_frame_guided, init_extractor_frame_guided,
)
from mtasr_tpu.models.sparse_slot import (
    find_spikes, init_sparse_slot_params, prune_spikes_topk,
    sparse_slot_bridge, spike_pool_gaussian,
)


def _py_find_spikes(a, thresh, min_dist):
    idx, last = [], -min_dist - 1
    T = len(a)
    for t in range(T):
        if a[t] >= thresh and (t - last) >= min_dist:
            l, r = max(0, t - 1), min(T - 1, t + 1)
            if a[t] >= a[l] and a[t] >= a[r]:
                idx.append(t)
                last = t
    return idx


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_find_spikes_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    B, T = 3, 60
    A = rng.random((B, T)).astype(np.float32)
    spikes, count = find_spikes(jnp.asarray(A), thresh=0.6, min_dist=4,
                                max_spikes=32)
    spikes, count = np.asarray(spikes), np.asarray(count)
    for b in range(B):
        ref = _py_find_spikes(A[b], 0.6, 4)[:32]
        assert count[b] == len(ref)
        np.testing.assert_array_equal(spikes[b, :len(ref)], ref)
        assert np.all(spikes[b, len(ref):] == -1)


def test_prune_and_pool():
    rng = np.random.default_rng(3)
    B, T, D = 2, 50, 8
    A = jnp.asarray(rng.random((B, T)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    spikes, _ = find_spikes(A, 0.5, 3, max_spikes=16)
    pruned = prune_spikes_topk(A, spikes, k=4)
    assert pruned.shape == (B, 4)
    Z, valid = spike_pool_gaussian(h, pruned)
    assert Z.shape == (B, 4, D)
    # pooled vectors are convex-ish combos of nearby frames -> bounded
    assert float(jnp.max(jnp.abs(Z))) <= float(jnp.max(jnp.abs(h))) + 1e-4
    # invalid slots pool to zero
    assert np.all(np.asarray(Z)[~np.asarray(valid)] == 0)


def test_sparse_slot_bridge_end_to_end():
    rng = np.random.default_rng(4)
    B, Tm, Thi, Dc, Dm = 2, 20, 40, 8, 16
    p = init_sparse_slot_params(jax.random.key(0), Dc, Dm, max_slots=16,
                                n_heads=4)
    x = jnp.asarray(rng.standard_normal((B, Tm, Dm)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, Thi, Dc)), jnp.float32)
    A = jnp.asarray(rng.random((B, Thi)), jnp.float32)
    out, valid = sparse_slot_bridge(p, x, h, A, n_heads=4, top_k=8)
    assert out.shape == (B, Tm, Dm)
    assert np.all(np.isfinite(np.asarray(out)))


def test_frame_guided_extractor():
    rng = np.random.default_rng(5)
    B, Tm, Tk, Dm_in, Ds, D, K, V = 2, 20, 30, 8, 6, 16, 2, 10
    p = init_extractor_frame_guided(jax.random.key(1), Dm_in, Ds, D, K)
    x = jnp.asarray(rng.standard_normal((B, Tm, Dm_in)), jnp.float32)
    seps = [jnp.asarray(rng.standard_normal((B, Tk, Ds)), jnp.float32)
            for _ in range(K)]
    logits = [jnp.asarray(rng.standard_normal((B, Tk, V)), jnp.float32)
              for _ in range(K)]
    out, mask = extractor_concat_frame_guided(p, x, V - 1, seps, logits)
    assert out.shape == (B, K * Tm, D)
    assert mask.shape == (B, K * Tm) and bool(mask.all())
    # entropy down-weight / sigmoid gate variants run
    out2, _ = extractor_concat_frame_guided(
        p, x, V - 1, seps, logits, entropy_lambda=0.5, gate_mode="sigmoid",
        prob_floor=0.1)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_shared_core_wrappers():
    rng = np.random.default_rng(6)
    B, L, H, Dm = 2, 7, 16, 8
    p = init_shared_core_params(jax.random.key(2), H, Dm, attn_dim=8,
                                n_layers=3, mlp_rank=4, use_post_mlp=True)
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, 11, Dm)), jnp.float32)
    outs = [shared_core_forward(p, i, hidden, mem) for i in range(3)]
    for o in outs:
        assert o.shape == hidden.shape
        assert np.all(np.isfinite(np.asarray(o)))
    # per-layer MLPs differ -> outputs differ across layers
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))
    # None memory is a no-op
    np.testing.assert_array_equal(
        np.asarray(shared_core_forward(p, 0, hidden, None)),
        np.asarray(hidden))
