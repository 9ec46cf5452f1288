"""Golden tests: our CTC loss vs torch.nn.CTCLoss, collapse vs a Python
reference implementing ctc_remove_duplicates_and_blank semantics
(/root/reference/models/modeling_speech_encoder_decoder_llama.py:902-972)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.ops.ctc import ctc_loss, ctc_loss_with_logits, ctc_greedy_collapse

torch = pytest.importorskip("torch")


def _torch_ctc(log_probs, ilens, labels, olens, blank):
    lp = torch.tensor(np.asarray(log_probs)).transpose(0, 1)  # [T, B, V]
    loss = torch.nn.CTCLoss(reduction="none", zero_infinity=True, blank=blank)(
        lp, torch.tensor(np.asarray(labels)),
        torch.tensor(np.asarray(ilens)), torch.tensor(np.asarray(olens)))
    return loss.numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_torch(seed):
    rng = np.random.default_rng(seed)
    B, T, V, L = 4, 37, 11, 9
    blank = V - 1
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ilens = rng.integers(L + 4, T + 1, size=B).astype(np.int32)
    olens = rng.integers(1, L + 1, size=B).astype(np.int32)
    labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)

    ours = np.asarray(ctc_loss(log_probs, jnp.asarray(ilens),
                               jnp.asarray(labels), jnp.asarray(olens), blank))
    ref = _torch_ctc(np.asarray(log_probs), ilens, labels, olens, blank)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_empty_label():
    rng = np.random.default_rng(3)
    B, T, V, L = 3, 20, 7, 5
    blank = V - 1
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ilens = np.array([20, 15, 8], np.int32)
    olens = np.array([0, 3, 0], np.int32)
    labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)
    ours = np.asarray(ctc_loss(log_probs, jnp.asarray(ilens),
                               jnp.asarray(labels), jnp.asarray(olens), blank))
    ref = _torch_ctc(np.asarray(log_probs), ilens, labels, olens, blank)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_impossible_alignment_zeroed():
    # input shorter than needed -> torch zero_infinity gives 0
    rng = np.random.default_rng(4)
    B, T, V = 2, 4, 6
    blank = V - 1
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = np.tile(np.array([[1, 1, 1, 1, 1]], np.int32), (B, 1))  # needs T>=9
    ilens = np.array([4, 4], np.int32)
    olens = np.array([5, 5], np.int32)
    ours = np.asarray(ctc_loss(log_probs, jnp.asarray(ilens),
                               jnp.asarray(labels), jnp.asarray(olens), blank))
    np.testing.assert_allclose(ours, np.zeros(B), atol=1e-6)


def test_ctc_loss_grad_matches_torch():
    rng = np.random.default_rng(5)
    B, T, V, L = 2, 15, 8, 4
    blank = V - 1
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    ilens = np.array([15, 12], np.int32)
    olens = np.array([4, 2], np.int32)
    labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)

    def loss_fn(lg):
        return jnp.sum(ctc_loss_with_logits(
            lg, jnp.asarray(ilens), jnp.asarray(labels), jnp.asarray(olens), blank))

    g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    tl = torch.tensor(logits, requires_grad=True)
    lp = torch.nn.functional.log_softmax(tl, dim=-1).transpose(0, 1)
    loss = torch.nn.CTCLoss(reduction="none", zero_infinity=True, blank=blank)(
        lp, torch.tensor(labels), torch.tensor(ilens), torch.tensor(olens)).sum()
    loss.backward()
    np.testing.assert_allclose(g_ours, tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def _py_collapse(row, mask_row, blank, pad, across_blanks=True):
    out, last_kept = [], None
    for tok, m in zip(row, mask_row):
        if not m:
            continue
        tok = int(tok)
        if tok == pad or tok == blank:
            if not across_blanks and tok == blank:
                last_kept = None  # classic: blank resets the run
            continue
        if across_blanks:
            if last_kept is not None and tok == last_kept:
                continue
        else:
            if last_kept is not None and tok == last_kept:
                continue
        out.append(tok)
        last_kept = tok
    return out


@pytest.mark.parametrize("across", [True, False])
def test_ctc_greedy_collapse(across):
    rng = np.random.default_rng(6)
    B, T, V = 5, 40, 6
    blank, pad = V - 1, V - 2
    path = rng.integers(0, V, size=(B, T)).astype(np.int32)
    lens = rng.integers(5, T + 1, size=B)
    mask = np.arange(T)[None, :] < lens[:, None]
    Lmax = 32

    out, out_lens = ctc_greedy_collapse(
        jnp.asarray(path), jnp.asarray(mask), blank, pad, Lmax,
        collapse_across_blanks=across)
    out, out_lens = np.asarray(out), np.asarray(out_lens)

    for b in range(B):
        ref = _py_collapse(path[b], mask[b], blank, pad, across)[:Lmax]
        assert out_lens[b] == len(ref)
        np.testing.assert_array_equal(out[b, :len(ref)], ref)
        assert np.all(out[b, len(ref):] == pad)


def test_ctc_collapse_truncation():
    # more outputs than max_out_len -> truncated, length capped
    path = np.array([[0, 1, 2, 3, 0, 1, 2, 3]], np.int32)
    mask = np.ones_like(path, bool)
    out, lens = ctc_greedy_collapse(jnp.asarray(path), jnp.asarray(mask),
                                    blank_id=9, pad_id=8, max_out_len=3)
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(out)[0], [0, 1, 2])
