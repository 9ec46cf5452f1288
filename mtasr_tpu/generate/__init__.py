from mtasr_tpu.generate.engine import generate, generate_ctc
