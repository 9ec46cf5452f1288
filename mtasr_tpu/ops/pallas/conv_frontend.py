"""Fused first-conv-layer kernel for the WavLM feature encoder.

Replaces XLA's `conv_general_dilated` for the frontend's layer 0
(k=10, stride=5, C_in=1 — /root/reference/models/modeling_wavlm.py conv
stack; the reference leans on cuDNN conv kernels there, SURVEY §2
native-code note). On TPU that conv is pathological for the compiler: the
contraction dim is k*C_in = 10 (<<128 MXU lanes) and every window/im2col
formulation materializes minor-dim-10 intermediates that the (8, 128) HBM
tiling pads 13x. Measured at B=128, 10 s audio on v5e:

    XLA conv + LN + gelu          53.3 ms   (0.8 TF/s)
    s2d / tap-matmul variants     >=53 ms   (layout-bound, same wall)
    this kernel                   ~29 ms    (~14.8 conv+LN, ~14 gelu VPU)

Design (measured alternatives in parentheses):

* The waveform block [Bb, F*stride] stays in its natural 2D layout; the
  overlapping tail (k - stride samples) comes from a second BlockSpec view
  of the same array one 128-lane tile ahead, index-clamped at the end of
  the signal (the clamped garbage only ever feeds output frames the grid
  masks away).
* Windows are built ON THE MXU with a constant 0/1 selection matrix
  D[t, F*j+f] = [t == stride*f + j]: XS = xw @ D gives all k taps of all
  F frames in one contraction-768 dot. (In-VMEM reshape [Bb,640]->[Bb,128,5]
  is an unsupported Mosaic shape cast; strided lane slices fail verification;
  lane-offset slice concat hits "offset mismatch on non-concat dimension";
  pltpu.roll needs 32-bit and bitwidth-changing bitcasts are unsupported —
  the selection matmul sidesteps the lane shuffles entirely.)
* Per batch row, frames x taps (transposed-lhs dot, supported) against
  A[k, O] -> conv output [F, O]; optional bias; optional fused LayerNorm
  (feat_extract_norm == "layer") and exact-form gelu with the polynomial
  erf (layers._ERF_POLY — Mosaic has no erf/erfc primitive at all).
* Output written once, bf16 [B, T_out, O]: the kernel's remaining wall is
  the erf polynomial on the VPU (~14 ms over 2.1e9 elements), which the
  XLA path pays on top of its conv inefficiency.

Backward: custom_vjp whose bwd is the vjp of the identical XLA composition
(the reference recipes freeze the conv frontend — unfreeze_utils.py:87-89 —
so this path is cold; it exists for correctness when someone unfreezes).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

_F = 128       # output frames per program (F*stride must be lane-aligned)
_BB = 32       # batch rows per program


def supported(kernel: int, stride: int, in_dim: int, out_dim: int,
              batch: int, n_samples: int) -> bool:
    if not (in_dim == 1 and kernel == 2 * stride
            and (_F * stride) % 128 == 0
            and out_dim % 128 == 0
            and n_samples % 128 == 0
            and n_samples >= _F * stride + 128):
        return False
    # Every grid tile's main input block ([_F*stride] samples at offset
    # t*_F*stride) must be fully in bounds: a partially out-of-range block
    # is DMA-padded with undefined values, and the window-selection matmul
    # contracts over ALL block columns — 0 x NaN = NaN would poison even
    # the tile's valid frames. (10 s x 16 kHz = 160 000 is 640-aligned.)
    t_out = (n_samples - kernel) // stride + 1
    if t_out < 1:
        return False
    n_t = -(-t_out // _F)
    return n_t * _F * stride <= n_samples


def _erf(x):
    from mtasr_tpu.models.layers import _ERF_POLY
    u = jnp.clip(x, -3.9, 3.9)
    u2 = u * u
    p = jnp.float32(_ERF_POLY[-1])
    for c in _ERF_POLY[-2::-1]:
        p = p * u2 + jnp.float32(c)
    return u * p


def _make_D(kernel: int, stride: int) -> np.ndarray:
    xw = ((_F * stride + kernel - stride + 127) // 128) * 128
    D = np.zeros((xw, kernel * _F), np.float32)
    for f in range(_F):
        for j in range(kernel):
            D[stride * f + j, _F * j + f] = 1.0
    return D


def _kernel(xm_ref, xt_ref, d_ref, a_ref, b_ref, g_ref, bt_ref, o_ref, *,
            Bb, K, F, O, eps, fuse_ln, fuse_act):
    xw = jnp.concatenate([xm_ref[:], xt_ref[:]], axis=1)       # [Bb, XW]
    xs = lax.dot_general(xw, d_ref[:], (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)   # [Bb, K*F]
    xs = xs.reshape(Bb, K, F)
    a = a_ref[:].astype(jnp.float32)                           # [K, O]
    bias = b_ref[:]                                            # [1, O] f32
    g = g_ref[:]
    bt = bt_ref[:]
    for b in range(Bb):
        # transposed-lhs dot: [K, F]^T contracted with [K, O] -> [F, O]
        y = lax.dot_general(xs[b], a, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        y = y + bias
        if fuse_ln:
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            y = (y - mu) * lax.rsqrt(var + eps) * g + bt
        if fuse_act:
            y = 0.5 * y * (1.0 + _erf(y * jnp.float32(2.0 ** -0.5)))
        o_ref[b] = y.astype(o_ref.dtype)


def _conv0_xla(wave, weight, bias, gamma, beta, stride, eps,
               fuse_ln, fuse_act):
    """The identical math as plain XLA ops — backward path + golden ref.
    bias/gamma/beta are always arrays here (zeros/ones when unused).

    Both conv operands are cast to f32 (not bf16 + preferred f32): the
    conv vjp builds transposed convs mixing the f32 cotangent with the
    bf16 operand, which XLA rejects with a dtype mismatch. Values are
    bf16-representable so the f32 products are exact either way."""
    y = lax.conv_general_dilated(
        wave[:, :, None].astype(jnp.float32),
        jnp.transpose(weight, (2, 1, 0)).astype(jnp.float32),
        window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    y = y + bias.astype(jnp.float32)
    if fuse_ln:
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        y = (y - mu) * lax.rsqrt(var + eps) * gamma.astype(jnp.float32) \
            + beta.astype(jnp.float32)
    if fuse_act:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(wave.dtype)


def _conv0_kernel_call(wave, weight, bias, gamma, beta, stride, eps,
                       fuse_ln, fuse_act, interpret):
    """The raw pallas_call (shard-local shapes). Callers go through
    _conv0_p, which routes via the batch-sharding custom_partitioning
    rule in ops/pallas/spmd.py so a dp mesh splits the kernel per-device
    instead of gathering the waveform."""
    B, S = wave.shape
    O, _, K = weight.shape
    T_out = (S - K) // stride + 1
    XW = ((_F * stride + K - stride + 127) // 128) * 128
    Bb = _BB if B % _BB == 0 else (8 if B % 8 == 0 else B)
    A = jnp.transpose(weight, (2, 1, 0)).reshape(K, O).astype(wave.dtype)
    # selection matrix D[stride*f + j, F*j + f] = 1, built from iotas (not
    # a host numpy constant: the custom_partitioning tracer in
    # ops/pallas/spmd.py rejects closed-over jaxpr consts)
    xw_rows = ((_F * stride + K - stride + 127) // 128) * 128
    r = lax.broadcasted_iota(jnp.int32, (xw_rows, K * _F), 0)
    c = lax.broadcasted_iota(jnp.int32, (xw_rows, K * _F), 1)
    D = (r == stride * (c % _F) + c // _F).astype(wave.dtype)
    n_t = (T_out + _F - 1) // _F
    n_lane_blocks = S // 128
    tail_off = _F * stride // 128

    def tail_idx(b, t):
        return (b, jnp.minimum(t * tail_off + tail_off, n_lane_blocks - 1))

    kern = functools.partial(_kernel, Bb=Bb, K=K, F=_F, O=O, eps=eps,
                             fuse_ln=fuse_ln, fuse_act=fuse_act)
    return pl.pallas_call(
        kern,
        grid=(-(-B // Bb), n_t),
        in_specs=[
            pl.BlockSpec((Bb, _F * stride), lambda b, t: (b, t)),
            pl.BlockSpec((Bb, 128), tail_idx),
            pl.BlockSpec((XW, K * _F), lambda b, t: (0, 0)),
            pl.BlockSpec((K, O), lambda b, t: (0, 0)),
            pl.BlockSpec((1, O), lambda b, t: (0, 0)),
            pl.BlockSpec((1, O), lambda b, t: (0, 0)),
            pl.BlockSpec((1, O), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, _F, O), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_out, O), wave.dtype),
        interpret=interpret,
    )(wave, wave, D, A, bias.astype(jnp.float32)[None],
      gamma.astype(jnp.float32)[None], beta.astype(jnp.float32)[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _conv0_p(wave, weight, bias, gamma, beta, stride, eps, fuse_ln,
             fuse_act, interpret):
    from mtasr_tpu.ops.pallas.spmd import conv0_kernel_spmd
    return conv0_kernel_spmd(wave, weight, bias, gamma, beta,
                             stride=stride, eps=eps, fuse_ln=fuse_ln,
                             fuse_act=fuse_act, interpret=interpret)


def _conv0_fwd(wave, weight, bias, gamma, beta, stride, eps, fuse_ln,
               fuse_act, interpret):
    out = _conv0_p(wave, weight, bias, gamma, beta, stride, eps, fuse_ln,
                   fuse_act, interpret)
    return out, (wave, weight, bias, gamma, beta)


def _conv0_bwd(stride, eps, fuse_ln, fuse_act, interpret, res, ct):
    wave, weight, bias, gamma, beta = res

    def f(wave, weight, bias, gamma, beta):
        return _conv0_xla(wave, weight, bias, gamma, beta, stride, eps,
                          fuse_ln, fuse_act)

    _, vjp = jax.vjp(f, wave, weight, bias, gamma, beta)
    return vjp(ct)


_conv0_p.defvjp(_conv0_fwd, _conv0_bwd)


def conv0_fused(wave: jax.Array,              # [B, S]
                weight: jax.Array,            # [O, 1, K] torch layout
                bias: Optional[jax.Array],    # [O] or None
                gamma: Optional[jax.Array] = None,   # [O] when fuse_ln
                beta: Optional[jax.Array] = None,    # [O] when fuse_ln
                *,
                stride: int,
                eps: float = 1e-5,
                fuse_ln: bool = True,
                fuse_act: bool = True,
                interpret: bool = False) -> jax.Array:
    O = weight.shape[0]
    if bias is None:
        bias = jnp.zeros((O,), jnp.float32)
    if gamma is None:
        gamma = jnp.ones((O,), jnp.float32)
    if beta is None:
        beta = jnp.zeros((O,), jnp.float32)
    if not supported(weight.shape[2], stride, weight.shape[1], O,
                     wave.shape[0], wave.shape[1]):
        # Defensive: callers gate on supported() already (wavlm.py:175),
        # but a direct call with an unaligned S must not silently read
        # out-of-bounds blocks (NaN in valid tail frames).
        return _conv0_xla(wave, weight, bias, gamma, beta, stride, eps,
                          fuse_ln, fuse_act)
    return _conv0_p(wave, weight, bias, gamma, beta, stride, eps, fuse_ln,
                    fuse_act, interpret)
