"""Model components (pure-functional JAX: init fns build param pytrees whose
structure mirrors the HF state_dict key layout, forward fns are jit-friendly
pure functions).

  layers.py                  -- linear/conv/norm primitives (torch weight layout)
  wavlm.py                   -- WavLM encoder (conv frontend + rel-pos transformer + adapter)
  llama.py                   -- LLaMA decoder with speech-prefix splicing + KV cache
  separator.py               -- speaker separator (scan LSTM + K branches)
  ctc_head.py                -- per-speaker CTC heads
  adapters.py                -- tiny/gated/ctcaware/adaptive-LoRA cross-attn adapters
  bridges.py                 -- CTC bridges: raw / softmax refiner / ctcprompt, token builder, frame refiner
  losses.py                  -- HybridLoss (CE + serialized CTC + PIT)
  speech_encoder_decoder.py  -- the composite model
"""
