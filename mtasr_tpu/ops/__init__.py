"""Pure compute ops + Pallas TPU kernels for the hot paths.

The reference's performance-critical dependency kernels (SURVEY.md §2 note):
cuDNN CTC loss, SDPA/FlashAttention, conv feature extraction, and the
hand-rolled Python-loop LSTM separator. Here each becomes either an XLA-fused
pure-JAX op or a Pallas kernel:

  ctc.py        -- log-space CTC forward-backward + vectorized greedy collapse
  attention.py  -- fused multi-head attention (GQA, bias, masking)
  lstm.py       -- lax.scan stacked LSTM (replaces per-timestep Python loop)
  rope.py       -- rotary embeddings incl. llama3 frequency scaling
  norms.py      -- RMSNorm
  relpos.py     -- WavLM gated relative position bias buckets
  pallas/       -- hand-written TPU kernels (flash attention, CTC)
"""
from mtasr_tpu.ops.norms import rms_norm
from mtasr_tpu.ops.rope import compute_rope_freqs, apply_rotary_emb, rope_cos_sin
from mtasr_tpu.ops.attention import dot_product_attention
from mtasr_tpu.ops.lstm import lstm_scan, stacked_lstm
from mtasr_tpu.ops.ctc import ctc_loss, ctc_greedy_collapse
from mtasr_tpu.ops.relpos import relative_position_bucket
