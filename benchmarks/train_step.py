"""Flagship train-step probe: encoder.remat on/off under the three-stage
PCGrad linearization (B=16, 10 s, hybrid+PCGrad+LoRA+scan)."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mtasr_tpu.config import (
    SpeechEncoderDecoderConfig, TrainingConfig, llama_1b_config,
    wavlm_large_config,
)
from mtasr_tpu.models.layers import tree_cast
from mtasr_tpu.models.speech_encoder_decoder import init_model_params
from mtasr_tpu.data.labels import build_training_arrays
from mtasr_tpu.train.freeze import trainable_mask
from mtasr_tpu.train.lora import init_decoder_lora
from mtasr_tpu.train.optimizer import make_optimizer
from mtasr_tpu.train.train_step import make_train_step

enc_remat = sys.argv[1] == "1"
B, secs = 16, 10

enc = wavlm_large_config(mask_time_prob=0.0, hidden_dropout=0.0,
                         attention_dropout=0.0, activation_dropout=0.0,
                         attention_impl="flash")
dec = llama_1b_config(vocab_size=128264)
cfg = SpeechEncoderDecoderConfig(
    encoder=enc, decoder=dec, train_mode="hybrid", talker_ctc=True,
    talker_numbers=2, separator_hidden=896)
cfg.encoder.scan_layers = True
cfg.decoder.scan_layers = True
cfg.encoder.remat = enc_remat
cfg.decoder.remat = True

init_jit = jax.jit(
    lambda k, cfg: tree_cast(init_model_params(k, cfg), jnp.bfloat16),
    static_argnames=("cfg",))
params = dict(init_jit(jax.random.key(1), cfg))
jax.block_until_ready(params)

S = 16000 * secs
rng = np.random.default_rng(0)
v_hi = min(cfg.decoder.vocab_size - 2, 40)
L = 24
labels = np.full((B, L), -100, np.int64)
for b in range(B):
    l1, l2 = 9, 10
    labels[b, :l1 + 1 + l2] = (list(rng.integers(3, v_hi, l1))
                               + [cfg.sc_token_id]
                               + list(rng.integers(3, v_hi, l2)))
arr = build_training_arrays(
    labels, pad_token_id=cfg.pad_token_id,
    decoder_start_token_id=cfg.decoder_start_token_id,
    eos_token_id=cfg.eos_token_id, sc_token_id=cfg.sc_token_id,
    talker_numbers=cfg.talker_numbers)
batch = {
    "input_values": jnp.asarray(rng.standard_normal((B, S)), jnp.bfloat16),
    "audio_mask": jnp.ones((B, S), jnp.int32),
    "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"], jnp.int32),
    "ce_labels": jnp.asarray(arr["ce_labels"], jnp.int32),
    "label_spks": jnp.asarray(arr["label_spks"], jnp.int32),
    "label_spk_lens": jnp.asarray(arr["label_spk_lens"], jnp.int32),
}
params["decoder_lora"] = init_decoder_lora(
    jax.random.key(7), params["decoder"], r=16, alpha=32.0)
tc = TrainingConfig(pcgrad=True, learning_rate=1e-4, warmup_steps=10,
                    max_steps=1000)
mask = trainable_mask(params, train_mode=cfg.train_mode, freeze_decoder=True)
opt = make_optimizer(tc, mask)
step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=True)
state = opt.init(params)
t0 = time.perf_counter()
p, s, m = step(params, state, batch, jax.random.key(0))
print(f"compile+first step: {time.perf_counter()-t0:.1f} s "
      f"loss={float(m['loss']):.3f}", flush=True)
n = 5
t0 = time.perf_counter()
for i in range(n):
    p, s, m = step(p, s, batch, jax.random.key(i))
    float(m["loss"])
dt = (time.perf_counter() - t0) / n
print(f"enc_remat={enc_remat}: {dt*1e3:.1f} ms/step, "
      f"{B/dt:.2f} samples/s", flush=True)
