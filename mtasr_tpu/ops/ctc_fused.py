"""Memory-fused CTC loss computed directly from encoder hidden states.

Motivation (measured on v5e): the naive path materializes the CTC head's
[B, T, vocab+1] logits in f32 — 2.9 GB per head per copy for the flagship
(B=12, T=499, V=128257) — and autodiff keeps ~8 copies alive, OOMing a
16 GB chip. The reference has the same tensor (torch frees eagerly; XLA's
remat scheduling does not).

This implementation NEVER materializes [B, T, V]:

forward:  lax.scan over time chunks — each chunk computes
          logits_c = hs_c @ W^T + b, its log-sum-exp, and gathers only the
          [B, Tc, 2L+1] lattice emissions; then the standard alpha recursion
          runs on the small [B, T, 2L+1] emission tensor.

backward: closed-form CTC gradient
              dL/dlogits[t, v] = softmax(logits)[t, v] * sum_s gamma[t, s]
                                 - gamma_scattered[t, v]
          with gamma = exp(alpha + beta - logZ) from a reverse-scan beta
          recursion, evaluated chunk-by-chunk (recomputing each chunk's
          logits) and immediately contracted into dL/dhs, dL/dW, dL/db —
          so the only [*, V]-sized live tensor is one chunk.

Semantics identical to ops/ctc.py / torch.nn.CTCLoss(reduction='none',
zero_infinity=True); golden-tested against both.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mtasr_tpu.ops.ctc import LOG_EPS, _interleave_blanks


def _lattice_meta(labels, label_lengths, blank_id, V):
    L = labels.shape[1]
    S = 2 * L + 1
    labels = jnp.clip(labels, 0, V - 1)
    ext = _interleave_blanks(labels, blank_id)                    # [B, S]
    s_idx = jnp.arange(S)
    prev2 = jnp.where(s_idx >= 2, ext[:, jnp.maximum(s_idx - 2, 0)], blank_id)
    allow = (ext != blank_id) & (ext != prev2) & (s_idx >= 2)[None, :]
    valid = s_idx[None, :] < (2 * label_lengths[:, None] + 1)
    return ext, allow, valid, S


def _pad_time(x, chunk):
    T = x.shape[1]
    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    return x, Tp


def _emit_scan(hs, w, b, ext, chunk):
    """Chunked emission gather: [B, T, D] -> emit [B, T, S] log-probs at
    lattice labels, never materializing [B, T, V]."""
    B, T, D = hs.shape
    hs_p, Tp = _pad_time(hs, chunk)
    n_chunks = Tp // chunk
    hs_c = hs_p.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)

    def step(_, hc):
        logits = jnp.einsum("btd,vd->btv", hc.astype(jnp.float32),
                            w.astype(jnp.float32)) + b.astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        emit = jnp.take_along_axis(logits, ext[:, None, :].repeat(
            hc.shape[1], 1), axis=2) - lse
        return None, emit

    _, emits = jax.lax.scan(step, None, hs_c)          # [n, B, chunk, S]
    emit = emits.transpose(1, 0, 2, 3).reshape(B, Tp, -1)[:, :T]
    return emit


def _alpha_scan(emit, input_lengths, allow, valid):
    """Standard log-alpha recursion; returns (alpha [B, T, S], ll [B])."""
    B, T, S = emit.shape

    def shift_right(a, n):
        return jnp.pad(a, ((0, 0), (n, 0)), constant_values=LOG_EPS)[:, :S]

    alpha0 = jnp.full((B, S), LOG_EPS)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    if S > 1:
        alpha0 = alpha0.at[:, 1].set(emit[:, 0, 1])
    alpha0 = jnp.where(valid, alpha0, LOG_EPS)
    alpha0 = jnp.maximum(alpha0, LOG_EPS)

    def step(alpha, inp):
        emit_row, t = inp
        stay = alpha
        from1 = shift_right(alpha, 1)
        from2 = jnp.where(allow, shift_right(alpha, 2), LOG_EPS)
        m = jnp.maximum(jnp.maximum(stay, from1), from2)
        m = jnp.maximum(m, LOG_EPS)
        new = m + jnp.log(jnp.exp(stay - m) + jnp.exp(from1 - m)
                          + jnp.exp(from2 - m)) + emit_row
        new = jnp.where(valid, new, LOG_EPS)
        new = jnp.maximum(new, LOG_EPS)
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        return new, new

    ts = jnp.arange(1, T)
    _, alphas = jax.lax.scan(step, alpha0,
                             (jnp.swapaxes(emit, 0, 1)[1:], ts))
    alpha = jnp.concatenate([alpha0[None], alphas], 0).transpose(1, 0, 2)
    return alpha


def _beta_scan(emit, input_lengths, label_lengths, allow, valid):
    """Reverse log-beta recursion (beta[t] excludes emission at t).
    Returns beta [B, T, S]."""
    B, T, S = emit.shape
    last = 2 * label_lengths
    s_iota = jnp.arange(S)[None, :]
    beta_final = jnp.where((s_iota == last[:, None])
                           | (s_iota == jnp.maximum(last - 1, 0)[:, None]),
                           0.0, LOG_EPS)
    beta_final = jnp.where(valid, beta_final, LOG_EPS)

    def shift_left(a, n):
        return jnp.pad(a, ((0, 0), (0, n)), constant_values=LOG_EPS)[:, n:]

    allow_s2 = shift_left(jnp.where(allow, 1.0, 0.0), 2) > 0

    def step(beta, inp):
        emit_next, t = inp        # emissions at time t+1; computing beta[t]
        term = jnp.maximum(beta + emit_next, LOG_EPS)
        stay = term
        from1 = shift_left(term, 1)
        from2 = jnp.where(allow_s2, shift_left(term, 2), LOG_EPS)
        m = jnp.maximum(jnp.maximum(stay, from1), from2)
        m = jnp.maximum(m, LOG_EPS)
        new = m + jnp.log(jnp.exp(stay - m) + jnp.exp(from1 - m)
                          + jnp.exp(from2 - m))
        new = jnp.where(valid, new, LOG_EPS)
        # rows where t+1 >= ilen: beta[t] is still the terminal beta
        at_end = (t == (input_lengths - 1))[:, None]
        past_end = (t >= input_lengths)[:, None]
        new = jnp.where(at_end | past_end, beta_final, new)
        return new, new

    ts = jnp.arange(T - 1)[::-1]
    emit_rev = jnp.swapaxes(emit, 0, 1)[1:][::-1]       # emissions T-1..1
    _, betas_rev = jax.lax.scan(step, beta_final, (emit_rev, ts))
    # betas_rev[i] = beta at time ts[i]; assemble [B, T, S]
    betas = betas_rev[::-1]                              # beta[0..T-2]
    beta = jnp.concatenate([betas, beta_final[None]], 0).transpose(1, 0, 2)
    # fix rows t >= ilen - 1: for t == ilen-1 beta = beta_final (handled),
    # for t >= ilen the value is unused (masked later)
    return beta


def _final_ll(alpha_last, label_lengths):
    last = 2 * label_lengths
    a_last = jnp.take_along_axis(alpha_last, last[:, None], 1)[:, 0]
    a_prev = jnp.take_along_axis(alpha_last,
                                 jnp.maximum(last - 1, 0)[:, None], 1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, LOG_EPS)
    m = jnp.maximum(a_last, a_prev)
    return m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def ctc_loss_from_hidden(hs, w, b, input_lengths, labels, label_lengths,
                         blank_id: int, time_chunk: int = 128):
    """Per-sample CTC loss [B] from hidden states hs [B, T, D] through a
    projection (w [V, D], b [V]) — fused, never materializing [B, T, V]."""
    loss, _ = _fwd_impl(hs, w, b, input_lengths, labels, label_lengths,
                        blank_id, time_chunk)
    return loss


def _fwd_impl(hs, w, b, input_lengths, labels, label_lengths, blank_id,
              time_chunk):
    V = w.shape[0]
    ext, allow, valid, S = _lattice_meta(labels, label_lengths, blank_id, V)
    emit = _emit_scan(hs, w, b, ext, time_chunk)
    alpha = _alpha_scan(emit, input_lengths, allow, valid)
    # per-sample final alpha row at its own input length
    idx = jnp.clip(input_lengths - 1, 0, emit.shape[1] - 1)
    alpha_last = jnp.take_along_axis(
        alpha, idx[:, None, None].repeat(S, 2), axis=1)[:, 0]
    ll = _final_ll(alpha_last, label_lengths)
    loss = -ll
    loss = jnp.where(loss >= -0.5 * LOG_EPS, 0.0, loss)
    loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
    return loss, (emit, alpha, ll, ext, allow, valid)


def _vjp_fwd(hs, w, b, input_lengths, labels, label_lengths, blank_id,
             time_chunk):
    loss, (emit, alpha, ll, ext, allow, valid) = _fwd_impl(
        hs, w, b, input_lengths, labels, label_lengths, blank_id, time_chunk)
    return loss, (hs, w, b, input_lengths, label_lengths, emit, alpha, ll,
                  ext, allow, valid)


def _vjp_bwd(blank_id, time_chunk, res, g):
    (hs, w, b, input_lengths, label_lengths, emit, alpha, ll, ext, allow,
     valid) = res
    B, T, D = hs.shape
    V = w.shape[0]
    S = emit.shape[2]

    beta = _beta_scan(emit, input_lengths, label_lengths, allow, valid)
    safe = ll > LOG_EPS * 0.5
    logz = jnp.where(safe, ll, 0.0)
    log_gamma = alpha + beta - logz[:, None, None]
    gamma = jnp.exp(jnp.clip(log_gamma, LOG_EPS, 0.0))        # [B, T, S]
    t_iota = jnp.arange(T)[None, :]
    frame_ok = (t_iota < input_lengths[:, None]) & safe[:, None]
    gamma = gamma * frame_ok[:, :, None] * valid[:, None, :]
    # scale by incoming cotangent per sample
    gamma = gamma * g[:, None, None]
    gsum = jnp.sum(gamma, axis=2)                              # [B, T]

    # chunked gradient: grad_logits_c = y_c * gsum_c - scatter(gamma_c)
    hs_p, Tp = _pad_time(hs, time_chunk)
    n_chunks = Tp // time_chunk
    hs_c = hs_p.reshape(B, n_chunks, time_chunk, D).transpose(1, 0, 2, 3)
    gamma_p, _ = _pad_time(gamma, time_chunk)
    gamma_c = gamma_p.reshape(B, n_chunks, time_chunk, S).transpose(1, 0, 2, 3)
    gsum_p, _ = _pad_time(gsum[:, :, None], time_chunk)
    gsum_c = gsum_p.reshape(B, n_chunks, time_chunk).transpose(1, 0, 2)

    def step(carry, inp):
        dw_acc, db_acc = carry
        hc, gam, gs = inp
        logits = jnp.einsum("btd,vd->btv", hc.astype(jnp.float32),
                            w.astype(jnp.float32)) + b.astype(jnp.float32)
        y = jax.nn.softmax(logits, axis=-1)
        grad_logits = y * gs[:, :, None]
        # scatter gamma onto the vocab axis at ext positions
        bidx = jnp.arange(B)[:, None, None]
        tidx = jnp.arange(hc.shape[1])[None, :, None]
        grad_logits = grad_logits.at[bidx, tidx, ext[:, None, :]].add(-gam)
        dhs = jnp.einsum("btv,vd->btd", grad_logits, w.astype(jnp.float32))
        dw_acc = dw_acc + jnp.einsum("btv,btd->vd", grad_logits,
                                     hc.astype(jnp.float32))
        db_acc = db_acc + jnp.sum(grad_logits, axis=(0, 1))
        return (dw_acc, db_acc), dhs

    (dw, db), dhs_c = jax.lax.scan(
        step, (jnp.zeros((V, D), jnp.float32), jnp.zeros((V,), jnp.float32)),
        (hs_c, gamma_c, gsum_c))
    dhs = dhs_c.transpose(1, 0, 2, 3).reshape(B, Tp, D)[:, :T]
    return (dhs.astype(hs.dtype), dw.astype(w.dtype), db.astype(b.dtype),
            None, None, None)


ctc_loss_from_hidden.defvjp(_vjp_fwd, _vjp_bwd)
