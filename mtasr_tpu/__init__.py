"""mtasr_tpu — TPU-native multi-talker ASR with LLMs.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference `Hao-Shi-SBINT/Multi-talker-ASR-with-LLMs`:
WavLM speech encoder -> speaker separator + serialized CTC heads +
bridge/adapter family -> LLaMA decoder generating serialized-output
transcriptions with speaker-change tokens.

Layer map (mirrors SURVEY.md):
  config    -- structured configs with the reference's flag names
  ops       -- pure-function compute ops + Pallas TPU kernels
  models    -- flax.linen modules (WavLM, LLaMA, separator, CTC, adapters)
  parallel  -- mesh/sharding rules ('data','model') over ICI/DCN
  generate  -- KV-cached AR decoding + one-shot CTC decoding
  train     -- train step, PCGrad, freeze/LoRA, checkpointing
  data      -- host-side pipeline: Kaldi scp/text -> bucketed batches
  utils     -- WER scoring, logging, HF weight interop
"""

__version__ = "0.1.0"
