"""Hand-written Pallas TPU kernels for the hot ops.

  flash_attention.py -- tiled online-softmax attention (forward), with
                        additive-bias support (WavLM gated rel-pos bias) and
                        causal/padding masking; VMEM-resident tiles, MXU
                        matmuls, no materialized [T, S] score matrix.
  ctc_kernel.py      -- CTC alpha recursion in VMEM (single kernel launch per
                        batch tile instead of a T-step XLA scan).

Measured on v5e (2026-08): with 512x512 blocks the flash kernel BEATS
XLA's fused attention at WavLM-Large shapes (B=32 T=499 H=16 D=64 rel-pos:
4.38 vs 5.90 ms; at small blocks it lost — block size is the whole game).
The CTC lattice kernel matches the XLA scan exactly but is slower
(fwd 6.7 vs 5.1 ms, grad 15.2 vs 4.7 ms), so the scan remains the CTC
default while `attention_impl='flash'` is the fast path for encoder
attention.
"""
