"""CTC forward-backward as Pallas TPU kernels.

The flagship native kernel (SURVEY.md §7 hard-part #1): the cuDNN CTC the
reference leans on (/root/reference/models/ctc.py:44-46) becomes two Pallas
kernels that keep the whole [T, 2L+1] lattice recursion in VMEM:

* forward  -- alpha recursion over time with lane-shifted logsumexp; one
  program per batch row; emits per-sample loss AND the full alpha lattice
  (saved for backward)
* backward -- beta recursion (reverse time) fused with the posterior
  combine: grad_emit[t,s] = -exp(alpha + beta - logZ), written directly

The emission gather (log_probs -> lattice) and the scatter back to the
vocabulary axis are XLA ops outside the kernels — they are embarrassingly
parallel; only the T-step recursion benefits from the hand-written kernel.

Semantics identical to ops/ctc.py (torch CTCLoss reduction='none',
zero_infinity) — property-tested against it and against torch.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtasr_tpu.ops.ctc import LOG_EPS, _interleave_blanks


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, LOG_EPS)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
                           + jnp.exp(c - m_safe))
    return jnp.maximum(out, LOG_EPS)


def _shift_right_lane(x, n):
    """[1, S] -> shifted right by n lanes, filling with LOG_EPS."""
    S = x.shape[-1]
    rolled = pltpu.roll(x, n, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < n, LOG_EPS, rolled)


def _shift_left_lane(x, n):
    S = x.shape[-1]
    rolled = pltpu.roll(x, S - n, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= S - n, LOG_EPS, rolled)


def _fwd_kernel(ilen_ref, emit_ref, allow_ref, valid_ref,
                alpha_out_ref, ll_ref, *, T: int, S: int):
    """Per-batch-row alpha recursion. emit [T, S]; allow/valid [1, S];
    ilen2 [B, 2] scalar-prefetch. Outputs alpha [T, S] and ll [1, S] (final
    pre-logsumexp alpha row broadcast; reduction done outside)."""
    allow = allow_ref[0, 0:1, :]         # [1, S] 1.0 where skip allowed
    valid = valid_ref[0, 0:1, :]         # [1, S] 1.0 where lattice pos valid
    ilen = ilen_ref[pl.program_id(0), 0]

    alpha0 = emit_ref[0, 0:1, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    alpha0 = jnp.where(lane < 2, alpha0, LOG_EPS)
    alpha0 = jnp.where(valid > 0, alpha0, LOG_EPS)
    alpha0 = jnp.maximum(alpha0, LOG_EPS)
    alpha_out_ref[0, 0:1, :] = alpha0

    def body(t, alpha):
        stay = alpha
        from1 = _shift_right_lane(alpha, 1)
        from2 = jnp.where(allow > 0, _shift_right_lane(alpha, 2), LOG_EPS)
        new = _logsumexp3(stay, from1, from2) + emit_ref[0, pl.ds(t, 1), :]
        new = jnp.where(valid > 0, new, LOG_EPS)
        new = jnp.maximum(new, LOG_EPS)
        new = jnp.where(t < ilen, new, alpha)
        alpha_out_ref[0, pl.ds(t, 1), :] = new
        return new

    final = jax.lax.fori_loop(1, T, body, alpha0)
    ll_ref[0, 0:1, :] = final


def _bwd_kernel(ilen_ref, emit_ref, allow_ref, valid_ref, alpha_ref,
                grad_ref, *, T: int, S: int):
    """Beta recursion fused with the posterior combine's log part: writes
    raw log-posterior alpha[t,s] + beta[t,s] (the -exp(. - logZ) combine
    happens outside — scalars like logZ stay out of the kernel).
    beta[t,s] excludes emission at t; beta[ilen-1, s] = 0 for the two final
    lattice states."""
    allow = allow_ref[0, 0:1, :]
    valid = valid_ref[0, 0:1, :]
    b = pl.program_id(0)
    ilen = ilen_ref[b, 0]
    last = ilen_ref[b, 1]   # index of final blank = 2 * label_len

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    # beta at final time: 0 for s in {last, last-1}, else -inf
    beta_T = jnp.where((lane == last) | (lane == jnp.maximum(last - 1, 0)),
                       0.0, LOG_EPS)
    beta_T = jnp.where(valid > 0, beta_T, LOG_EPS)

    def write_grad(t, beta):
        alpha_t = alpha_ref[0, pl.ds(t, 1), :]
        g = jnp.maximum(alpha_t + beta, LOG_EPS)
        g = jnp.where((valid > 0) & (t < ilen), g, LOG_EPS)
        grad_ref[0, pl.ds(t, 1), :] = g

    def body(i, beta):
        # i runs 0..T-1 mapping to t = T-1-i (reverse)
        t = T - 1 - i
        active = t < ilen

        @pl.when(active & (t == ilen - 1))
        def _():
            write_grad(t, beta_T)

        def step(beta):
            # transition INTO t from t+1 states s, s+1, s+2
            emit_next = emit_ref[0, pl.ds(jnp.minimum(t + 1, T - 1), 1), :]
            term = beta + emit_next
            term = jnp.maximum(term, LOG_EPS)
            stay = term
            from1 = _shift_left_lane(term, 1)
            # skip transition s -> s+2 allowed iff allow[s+2]
            from2 = jnp.where(_shift_left_lane(allow, 2) > 0,
                              _shift_left_lane(term, 2), LOG_EPS)
            new = _logsumexp3(stay, from1, from2)
            new = jnp.where(valid > 0, new, LOG_EPS)
            return new

        new_beta = jnp.where(active & (t < ilen - 1), step(beta), beta)

        @pl.when(active & (t < ilen - 1))
        def _():
            write_grad(t, new_beta)

        @pl.when(~active)
        def _():
            grad_ref[0, pl.ds(t, 1), :] = jnp.full((1, S), LOG_EPS,
                                                   jnp.float32)

        return jnp.where(active & (t == ilen - 1), beta_T, new_beta)

    jax.lax.fori_loop(0, T, body, beta_T)


def _pad_to_lane(x, axis, mult=128, fill=0.0):
    size = x.shape[axis]
    target = ((size + mult - 1) // mult) * mult
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=fill)


def _prepare(log_probs, input_lengths, labels, label_lengths, blank_id):
    B, T, V = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    labels = jnp.clip(labels, 0, V - 1)
    ext = _interleave_blanks(labels, blank_id)
    emit = jnp.take_along_axis(log_probs.astype(jnp.float32),
                               ext[:, None, :], axis=2)      # [B, T, S]
    s_idx = jnp.arange(S)
    prev2 = jnp.where(s_idx >= 2, ext[:, jnp.maximum(s_idx - 2, 0)], blank_id)
    allow = ((ext != blank_id) & (ext != prev2)
             & (s_idx >= 2)[None, :]).astype(jnp.float32)
    valid = (s_idx[None, :] < (2 * label_lengths[:, None] + 1)).astype(
        jnp.float32)
    return emit, allow, valid, ext, S


@functools.partial(jax.jit, static_argnames=("blank_id", "interpret"))
def ctc_loss_pallas_fwd(log_probs, input_lengths, labels, label_lengths,
                        blank_id: int, interpret: bool = False):
    """Returns (loss [B], alpha [B, T, Sp], emit meta) — forward only."""
    B, T, V = log_probs.shape
    emit, allow, valid, ext, S = _prepare(log_probs, input_lengths, labels,
                                          label_lengths, blank_id)
    emit_p = _pad_to_lane(emit, 2, fill=LOG_EPS)
    allow_p = _pad_to_lane(allow[:, None, :], 2)
    valid_p = _pad_to_lane(valid[:, None, :], 2)
    Sp = emit_p.shape[2]
    ilen2 = jnp.stack([input_lengths.astype(jnp.int32),
                       (2 * label_lengths).astype(jnp.int32)], 1)  # [B, 2]

    kernel = functools.partial(_fwd_kernel, T=T, S=Sp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, Sp), lambda b, il: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, il: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, il: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Sp), lambda b, il: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, il: (b, 0, 0)),
        ],
    )
    alpha, final_row = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, Sp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Sp), jnp.float32),
        ],
        interpret=interpret,
    )(ilen2, emit_p, allow_p, valid_p)

    last = (2 * label_lengths).astype(jnp.int32)
    fr = final_row[:, 0, :]
    a_last = jnp.take_along_axis(fr, last[:, None], 1)[:, 0]
    a_prev = jnp.take_along_axis(fr, jnp.maximum(last - 1, 0)[:, None], 1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, LOG_EPS)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    loss = -ll
    loss = jnp.where(loss >= -0.5 * LOG_EPS, 0.0, loss)
    loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
    return loss, alpha, ll


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(log_probs, input_lengths, labels, label_lengths,
                    blank_id: int, interpret: bool = False):
    loss, _, _ = ctc_loss_pallas_fwd(log_probs, input_lengths, labels,
                                     label_lengths, blank_id, interpret)
    return loss


def _vjp_fwd(log_probs, input_lengths, labels, label_lengths, blank_id,
             interpret):
    loss, alpha, ll = ctc_loss_pallas_fwd(log_probs, input_lengths, labels,
                                          label_lengths, blank_id, interpret)
    return loss, (log_probs, input_lengths, labels, label_lengths, alpha, ll)


def _vjp_bwd(blank_id, interpret, res, g):
    log_probs, input_lengths, labels, label_lengths, alpha, ll = res
    B, T, V = log_probs.shape
    emit, allow, valid, ext, S = _prepare(log_probs, input_lengths, labels,
                                          label_lengths, blank_id)
    emit_p = _pad_to_lane(emit, 2, fill=LOG_EPS)
    allow_p = _pad_to_lane(allow[:, None, :], 2)
    valid_p = _pad_to_lane(valid[:, None, :], 2)
    Sp = emit_p.shape[2]
    ilen2 = jnp.stack([input_lengths.astype(jnp.int32),
                       (2 * label_lengths).astype(jnp.int32)], 1)
    # zero_infinity: samples whose ll is -inf-ish get zero grad
    safe = ll > LOG_EPS * 0.5
    logz = jnp.where(safe, ll, 0.0)

    kernel = functools.partial(_bwd_kernel, T=T, S=Sp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, Sp), lambda b, il: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, il: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, il: (b, 0, 0)),
            pl.BlockSpec((1, T, Sp), lambda b, il: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, Sp), lambda b, il: (b, 0, 0)),
    )
    log_post = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Sp), jnp.float32),
        interpret=interpret,
    )(ilen2, emit_p, allow_p, valid_p, alpha)

    grad_emit = -jnp.exp(jnp.clip(
        log_post[:, :, :S] - logz[:, None, None], LOG_EPS, 0.0))
    grad_emit = grad_emit * safe[:, None, None] * g[:, None, None]
    # scatter back to vocab axis: [B, T, S] -> [B, T, V]
    grad_lp = jnp.zeros((B, T, V), jnp.float32)
    b_idx = jnp.arange(B)[:, None, None]
    t_idx = jnp.arange(T)[None, :, None]
    v_idx = ext[:, None, :]
    grad_lp = grad_lp.at[b_idx, t_idx, v_idx].add(grad_emit)
    return grad_lp.astype(log_probs.dtype), None, None, None


ctc_loss_pallas.defvjp(_vjp_fwd, _vjp_bwd)
