from mtasr_tpu.generate.engine import generate, generate_ctc
from mtasr_tpu.generate.speculative import generate_speculative
