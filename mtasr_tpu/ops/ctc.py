"""CTC loss + greedy collapse, TPU-native.

The reference delegates CTC to `torch.nn.CTCLoss` (cuDNN kernels,
/root/reference/models/ctc.py:44-64) and collapses argmax paths with
per-sample Python loops
(/root/reference/models/modeling_speech_encoder_decoder_llama.py:902-972).
Here both are single XLA programs:

* `ctc_loss` — numerically-stable log-space alpha recursion over the
  [T, 2L+1] interleaved-blank lattice, vectorized over batch and lattice
  position, with a lax.scan over time. Matches torch.nn.CTCLoss semantics:
  per-sample negative log-likelihood (`reduction='none'`) with
  `zero_infinity=True` (impossible alignments give 0 loss). Gradients flow
  via autodiff through the scan, which reverse-mode-derives exactly the beta
  recursion.

* `ctc_greedy_collapse` — fully vectorized duplicate-collapse + blank/pad
  removal with static output shape [B, max_out_len].
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

LOG_EPS = -1e30


def _interleave_blanks(labels: jax.Array, blank_id: int) -> jax.Array:
    """[B, L] -> extended [B, 2L+1] = (blank, y1, blank, y2, ..., yL, blank)."""
    B, L = labels.shape
    S = 2 * L + 1
    s = jnp.arange(S)
    is_blank_pos = (s % 2) == 0
    label_idx = jnp.clip((s - 1) // 2, 0, max(L - 1, 0))
    gathered = labels[:, label_idx] if L > 0 else jnp.zeros((B, S), labels.dtype)
    return jnp.where(is_blank_pos[None, :], blank_id, gathered)


@partial(jax.jit, static_argnames=("blank_id", "zero_infinity"))
def ctc_loss(
    log_probs: jax.Array,       # [B, T, V] log-softmax over vocab (incl. blank)
    input_lengths: jax.Array,   # [B] int
    labels: jax.Array,          # [B, L] int (padded; pad content is ignored
                                #   beyond label_lengths)
    label_lengths: jax.Array,   # [B] int
    blank_id: int,
    zero_infinity: bool = True,
) -> jax.Array:
    """Per-sample CTC negative log-likelihood, shape [B]."""
    B, T, V = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    labels = jnp.clip(labels, 0, V - 1)
    ext = _interleave_blanks(labels, blank_id)                  # [B, S]

    # Emission scores for every lattice position: [B, T, S]
    emit = jnp.take_along_axis(
        log_probs.astype(jnp.float32), ext[:, None, :], axis=2)

    # Allowed skip (s-2 -> s) transitions: only onto a non-blank that differs
    # from the previous non-blank.
    s_idx = jnp.arange(S)
    prev2 = jnp.where(s_idx >= 2, ext[:, jnp.maximum(s_idx - 2, 0)], blank_id)
    allow_skip = (ext != blank_id) & (ext != prev2) & (s_idx >= 2)[None, :]

    # Lattice positions beyond 2*label_len are invalid.
    valid_pos = s_idx[None, :] < (2 * label_lengths[:, None] + 1)   # [B, S]

    def shift_right(a, n):
        return jnp.pad(a, ((0, 0), (n, 0)), constant_values=LOG_EPS)[:, :S]

    # init: alpha_0[0] = emit[0, 0]; alpha_0[1] = emit[0, 1]
    alpha0 = jnp.full((B, S), LOG_EPS)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    if L > 0:
        alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0,
                                               emit[:, 0, 1], LOG_EPS))
    alpha0 = jnp.where(valid_pos, alpha0, LOG_EPS)

    emit_t = jnp.swapaxes(emit, 0, 1)   # [T, B, S]

    def step(alpha, inputs):
        emit_row, t = inputs
        stay = alpha
        from1 = shift_right(alpha, 1)
        from2 = jnp.where(allow_skip, shift_right(alpha, 2), LOG_EPS)
        m = jnp.maximum(jnp.maximum(stay, from1), from2)
        m_safe = jnp.maximum(m, LOG_EPS)
        summed = (
            jnp.exp(stay - m_safe) + jnp.exp(from1 - m_safe)
            + jnp.exp(from2 - m_safe))
        new = m_safe + jnp.log(summed) + emit_row
        new = jnp.where(valid_pos, new, LOG_EPS)
        new = jnp.maximum(new, LOG_EPS)  # clamp to keep -inf finite-ish
        # carry untouched once past this sample's input length
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, T)
    alpha, _ = jax.lax.scan(step, alpha0, (emit_t[1:], ts))

    # Samples with input_length could be 1: alpha0 already correct then.
    last = 2 * label_lengths                   # index of final blank
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, LOG_EPS)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    loss = -ll
    if zero_infinity:
        loss = jnp.where(loss >= -0.5 * LOG_EPS, 0.0, loss)
        loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
    return loss


def ctc_loss_with_logits(logits: jax.Array, input_lengths: jax.Array,
                         labels: jax.Array, label_lengths: jax.Array,
                         blank_id: int) -> jax.Array:
    """Reference CTC.loss_fn semantics (/root/reference/models/ctc.py:51-65):
    float32 log-softmax then per-sample loss; batch averaging is done by the
    caller (HybridLoss)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return ctc_loss(log_probs, input_lengths, labels, label_lengths, blank_id)


@partial(jax.jit, static_argnames=("blank_id", "pad_id", "max_out_len",
                                   "collapse_across_blanks"))
def ctc_greedy_collapse(
    path: jax.Array,            # [B, T] argmax token ids
    valid_mask: jax.Array,      # [B, T] bool, True=valid frame
    blank_id: int,
    pad_id: int,
    max_out_len: int,
    collapse_across_blanks: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Vectorized equivalent of ctc_remove_duplicates_and_blank
    (modeling_speech_encoder_decoder_llama.py:902-972): drop blanks/pads,
    collapse duplicates (optionally across blanks), right-pad with pad_id to
    the static length `max_out_len`.

    Returns (collapsed [B, max_out_len], lengths [B]). Tokens beyond
    max_out_len are truncated (the reference's dynamic Lmax becomes a static
    bucket; callers choose max_out_len >= expected transcript length).
    """
    B, T = path.shape
    t_idx = jnp.arange(T)[None, :]

    keepable = valid_mask & (path != blank_id) & (path != pad_id)

    if collapse_across_blanks:
        # previous *keepable* token before t (blanks skipped in comparison)
        marker = jnp.where(keepable, t_idx, -1)
        last_idx_incl = jax.lax.associative_scan(jnp.maximum, marker, axis=1)
        last_idx_excl = jnp.pad(
            last_idx_incl, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
        prev_tok = jnp.take_along_axis(
            path, jnp.maximum(last_idx_excl, 0), axis=1)
        prev_tok = jnp.where(last_idx_excl >= 0, prev_tok, -1)
    else:
        # classic CTC collapse: compare with the immediately preceding valid
        # frame's token (blank resets the run)
        marker = jnp.where(valid_mask & (path != pad_id), t_idx, -1)
        last_idx_incl = jax.lax.associative_scan(jnp.maximum, marker, axis=1)
        last_idx_excl = jnp.pad(
            last_idx_incl, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
        prev_tok = jnp.take_along_axis(
            path, jnp.maximum(last_idx_excl, 0), axis=1)
        prev_tok = jnp.where(last_idx_excl >= 0, prev_tok, -1)

    keep = keepable & (path != prev_tok)

    pos = jnp.cumsum(keep, axis=1) - 1                    # output slot per kept
    scatter_pos = jnp.where(keep & (pos < max_out_len), pos, max_out_len)
    out = jnp.full((B, max_out_len + 1), pad_id, dtype=path.dtype)
    b_idx = jnp.arange(B)[:, None] * jnp.ones((1, T), jnp.int32)
    out = out.at[b_idx.reshape(-1), scatter_pos.reshape(-1)].set(
        path.reshape(-1), mode="drop")
    out = out[:, :max_out_len]
    lengths = jnp.minimum(jnp.sum(keep, axis=1), max_out_len)
    return out, lengths
