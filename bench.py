"""Headline benchmark: RTFx (audio-seconds transcribed per wall-second per
chip) for batched KV-cached greedy decoding on the flagship configuration
(WavLM-Large + LLaMA-3.2-1B, bf16), measured on whatever accelerator
jax.devices() provides (real v5e chip under the driver).

Baseline target (BASELINE.md): >50x real-time per chip. Prints exactly one
JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mtasr_tpu.config import (
        GenerationConfig, SpeechEncoderDecoderConfig, llama_1b_config,
        wavlm_large_config,
    )
    from mtasr_tpu.generate import generate
    from mtasr_tpu.models.layers import tree_cast
    from mtasr_tpu.models.speech_encoder_decoder import init_model_params

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    # CPU fallback keeps the bench runnable anywhere (tiny geometry)
    if on_tpu:
        enc = wavlm_large_config(mask_time_prob=0.0, hidden_dropout=0.0,
                                 attention_dropout=0.0, activation_dropout=0.0,
                                 attention_impl="flash")
        dec = llama_1b_config(vocab_size=128264)  # specials resized in
        B, secs, max_new = 128, 10, 50
    else:
        enc = wavlm_large_config(num_hidden_layers=2, mask_time_prob=0.0,
                                 hidden_dropout=0.0, attention_dropout=0.0,
                                 activation_dropout=0.0)
        dec = llama_1b_config(num_hidden_layers=2, vocab_size=2048)
        B, secs, max_new = 2, 5, 8

    cfg = SpeechEncoderDecoderConfig(
        encoder=enc, decoder=dec, train_mode="attention", talker_ctc=False)
    params = tree_cast(init_model_params(jax.random.key(0), cfg), jnp.bfloat16)

    S = 16000 * secs
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, S)), jnp.bfloat16)
    amask = jnp.ones((B, S), jnp.int32)
    gen = GenerationConfig(do_sample=False)

    def run():
        out = generate(params, cfg, wav, amask, gen=gen,
                       max_new_tokens=max_new)
        out.sequences.block_until_ready()
        return out

    run()  # compile
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters

    audio_seconds = B * secs
    rtfx = audio_seconds / dt
    baseline = 50.0  # >50x real-time target per chip (BASELINE.md)
    print(json.dumps({
        "metric": "batched_greedy_decode_rtfx",
        "value": round(rtfx, 2),
        "unit": "audio_s_per_s_per_chip",
        "vs_baseline": round(rtfx / baseline, 3),
    }))


if __name__ == "__main__":
    main()
