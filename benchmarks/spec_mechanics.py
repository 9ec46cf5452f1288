"""Speculative decode mechanics on TPU at the bench shape.

Measures (B=256, 10 s audio, 150 new tokens, bf16):
1. plain greedy generate (baseline)
2. speculative w/ ORACLE draft (the model's own greedy output) — 100%
   acceptance, the mechanics' upper bound
3. speculative w/ random draft — 0% acceptance, the overhead floor
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mtasr_tpu.config import (
    GenerationConfig, SpeechEncoderDecoderConfig, llama_1b_config,
    wavlm_large_config,
)
from mtasr_tpu.generate import generate
from mtasr_tpu.generate.speculative import generate_speculative
from mtasr_tpu.models.layers import tree_cast
from mtasr_tpu.models.speech_encoder_decoder import init_model_params

B, secs, max_new = 256, 10, 150
spec_k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
if len(sys.argv) > 2:
    B = int(sys.argv[2])
# "peaked" mode: scale lm_head so argmax margins dwarf bf16 rounding (a
# random-init model's near-uniform logits flip ties under the different
# matmul shapes of the L=5 verify vs L=1 step; trained models have real
# margins). Demonstrates the mechanics at realistic acceptance.
PEAKED = len(sys.argv) > 3 and "peaked" in sys.argv[3]
F32 = len(sys.argv) > 3 and "f32" in sys.argv[3]
XLA_ATTN = len(sys.argv) > 3 and "xla" in sys.argv[3]

enc = wavlm_large_config(mask_time_prob=0.0, hidden_dropout=0.0,
                         attention_dropout=0.0, activation_dropout=0.0,
                         attention_impl="flash")
dec = llama_1b_config(vocab_size=128264)
if XLA_ATTN:
    dec.decode_attn_impl = "xla"
cfg = SpeechEncoderDecoderConfig(encoder=enc, decoder=dec,
                                 train_mode="attention", talker_ctc=False)
_dt = jnp.float32 if F32 else jnp.bfloat16
init_jit = jax.jit(lambda k, c: tree_cast(init_model_params(k, c), _dt),
                   static_argnames=("c",))
params = init_jit(jax.random.key(0), cfg)
if PEAKED:
    # 1B config ties embeddings (no lm_head); scaling the final RMSNorm
    # weight scales logits linearly without changing their direction
    params = dict(params)
    dec_p = dict(params["decoder"])
    model_p = dict(dec_p["model"])
    model_p["norm"] = {"weight": model_p["norm"]["weight"] * 50.0}
    dec_p["model"] = model_p
    params["decoder"] = dec_p
jax.block_until_ready(params)

rng = np.random.default_rng(0)
S = 16000 * secs
wav = jnp.asarray(rng.standard_normal((B, S)), jnp.bfloat16)
amask = jnp.ones((B, S), jnp.int32)
gen = GenerationConfig(do_sample=False)


def timeit(fn, iters=3):
    out = fn()
    np.asarray(out.sequences)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        np.asarray(out.sequences)
    return (time.perf_counter() - t0) / iters, out


dt_plain, out_plain = timeit(
    lambda: generate(params, cfg, wav, amask, gen=gen,
                     max_new_tokens=max_new))
print(f"plain greedy: {dt_plain*1e3:.0f} ms -> {B*secs/dt_plain:.0f} RTFx",
      flush=True)

oracle = np.asarray(out_plain.sequences)          # [B, 150]
g = GenerationConfig(do_sample=False, speculative="ctc", spec_k=spec_k,
                     spec_cache_factor=3.0)


def run_spec(draft):
    o, st = generate_speculative(params, cfg, wav, amask, gen=g,
                                 max_new_tokens=max_new, draft_tokens=draft)
    return o, st


def timeit_spec(draft, iters=3):
    o, st = run_spec(draft)
    np.asarray(o.sequences)
    t0 = time.perf_counter()
    for _ in range(iters):
        o, st = run_spec(draft)
        np.asarray(o.sequences)
    return (time.perf_counter() - t0) / iters, o, st


dt_or, o_or, st_or = timeit_spec(jnp.asarray(oracle, jnp.int32))
got = np.asarray(o_or.sequences)
agree = float((got == oracle).mean())
print(f"oracle spec_k={spec_k}: {dt_or*1e3:.0f} ms -> "
      f"{B*secs/dt_or:.0f} RTFx  agree={agree:.4f} "
      f"steps={int(st_or.spec_steps)}+{int(st_or.fallback_steps)}fb "
      f"acc={int(st_or.accepted_drafts)}", flush=True)

rand_draft = jnp.asarray(
    rng.integers(5, 1000, (B, max_new)), jnp.int32)
dt_rd, o_rd, st_rd = timeit_spec(rand_draft)
agree_rd = float((np.asarray(o_rd.sequences) == oracle).mean())
print(f"random-draft spec_k={spec_k}: {dt_rd*1e3:.0f} ms -> "
      f"{B*secs/dt_rd:.0f} RTFx  agree={agree_rd:.4f} "
      f"steps={int(st_rd.spec_steps)}+{int(st_rd.fallback_steps)}fb "
      f"acc={int(st_rd.accepted_drafts)}", flush=True)
