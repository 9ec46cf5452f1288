"""Hand-written Pallas TPU kernels for the hot ops.

  flash_attention.py -- tiled online-softmax attention (forward), with
                        additive-bias support (WavLM gated rel-pos bias) and
                        causal/padding masking; VMEM-resident tiles, MXU
                        matmuls, no materialized [T, S] score matrix.
  ctc_kernel.py      -- CTC alpha recursion in VMEM (single kernel launch per
                        batch tile instead of a T-step XLA scan).
"""
