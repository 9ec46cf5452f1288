"""Hand-written Pallas TPU kernels for the hot ops.

  flash_attention.py -- tiled online-softmax attention (forward), with
                        additive-bias support (WavLM gated rel-pos bias) and
                        causal/padding masking; VMEM-resident tiles, MXU
                        matmuls, no materialized [T, S] score matrix.
  ctc_kernel.py      -- CTC alpha recursion in VMEM (single kernel launch per
                        batch tile instead of a T-step XLA scan).

Measured on v5e (2026-08, B=8 T=1000 H=16 D=64 rel-pos attention / B=16
T=500 V=1024 L=64 CTC): XLA's fused paths beat these kernels (attention
4.1 vs 6.9 ms; CTC fwd 5.1 vs 6.7 ms, grad 4.7 vs 15.2 ms), so the
XLA implementations in ops/ are the defaults; these kernels are validated
alternatives (exact-match forward) for shapes/memory regimes where
materializing [T,S] scores or lattices would not fit.
"""
