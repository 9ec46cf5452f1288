"""Headline benchmark: RTFx (audio-seconds transcribed per wall-second per
chip) for batched KV-cached greedy decoding on the flagship configuration
(WavLM-Large + LLaMA-3.2-1B), measured on whatever accelerator
jax.devices() provides (real v5e chip under the driver).

Anchored to the reference's decode config: greedy, max_length=150
(inference_asr.py:187; round-1 bench used 50 new tokens which inflated RTFx
— VERDICT.md weak #3). Also reports training throughput (samples/s/chip for
the full hybrid+PCGrad train step) in the same JSON line under "extras".

Baseline target (BASELINE.md): >50x real-time per chip. Prints exactly one
JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""
import json
import time

import numpy as np


def _decode_rtfx(jax, jnp, cfg, params, B, secs, max_new, kv_quant=False):
    from mtasr_tpu.config import GenerationConfig
    from mtasr_tpu.generate import generate

    S = 16000 * secs
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, S)), jnp.bfloat16)
    amask = jnp.ones((B, S), jnp.int32)
    gen = GenerationConfig(do_sample=False, kv_quant=kv_quant)

    def run():
        out = generate(params, cfg, wav, amask, gen=gen,
                       max_new_tokens=max_new)
        # fetch to host (tiny [B, max_new] int32): on the remote-tunneled
        # TPU runtime block_until_ready alone can return before execution
        # completes, silently inflating throughput; a value fetch cannot
        np.asarray(out.sequences)

    run()  # compile
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters
    return B * secs / dt


def _train_throughput(jax, jnp, cfg, params, B, secs):
    """samples/s/chip for the flagship train step in the reference's standard
    recipe: freeze_decoder + decoder LoRA, hybrid SOT+CTC loss with PCGrad,
    2 talkers — driver-tracked so the training phase regresses loudly.

    The frozen decoder is the memory budget: full-param AdamW on all 1.55 B
    params needs 15.5 GB of params+moments alone (> the 15.75 GB chip);
    masked AdamW keeps moments only for encoder/separator/CTC/LoRA."""
    from mtasr_tpu.config import TrainingConfig
    from mtasr_tpu.data.labels import build_training_arrays
    from mtasr_tpu.train.freeze import trainable_mask
    from mtasr_tpu.train.lora import init_decoder_lora
    from mtasr_tpu.train.optimizer import make_optimizer
    from mtasr_tpu.train.train_step import make_train_step

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
        "input_values": jnp.asarray(
            rng.standard_normal((B, S)), jnp.bfloat16),
        "audio_mask": jnp.ones((B, S), jnp.int32),
        "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"], jnp.int32),
        "ce_labels": jnp.asarray(arr["ce_labels"], jnp.int32),
        "label_spks": jnp.asarray(arr["label_spks"], jnp.int32),
        "label_spk_lens": jnp.asarray(arr["label_spk_lens"], jnp.int32),
    }
    params = dict(params)
    params["decoder_lora"] = init_decoder_lora(
        jax.random.key(7), params["decoder"], r=16, alpha=32.0)
    tc = TrainingConfig(pcgrad=True, learning_rate=1e-4, warmup_steps=10,
                        max_steps=1000)
    mask = trainable_mask(params, train_mode=cfg.train_mode,
                          freeze_decoder=True)
    opt = make_optimizer(tc, mask)
    # donate=True: without donation two live copies of params+opt state
    # can't fit; with it the step updates in place like production training
    step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=True)
    state = opt.init(params)
    p, s, m = step(params, state, batch, jax.random.key(0))  # compile
    float(m["loss"])
    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        p, s, m = step(p, s, batch, jax.random.key(i))
        float(m["loss"])     # host fetch: see _decode_rtfx timing note
    dt = (time.perf_counter() - t0) / n_iters
    return B / dt


def main():
    import jax
    import jax.numpy as jnp

    from mtasr_tpu.config import (
        SpeechEncoderDecoderConfig, llama_1b_config, wavlm_large_config,
    )
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
        B, secs, max_new = 128, 10, 150
        train_B = 16
    else:
        enc = wavlm_large_config(num_hidden_layers=2, mask_time_prob=0.0,
                                 hidden_dropout=0.0, attention_dropout=0.0,
                                 activation_dropout=0.0)
        dec = llama_1b_config(num_hidden_layers=2, vocab_size=2048)
        B, secs, max_new = 2, 5, 8
        train_B = 2

    specials = ({} if on_tpu else          # tiny vocab: keep ids in range
                dict(pad_token_id=2040, sc_token_id=2041, bos_token_id=1,
                     eos_token_id=2, decoder_start_token_id=1))
    cfg = SpeechEncoderDecoderConfig(
        encoder=enc, decoder=dec, train_mode="attention", talker_ctc=False,
        **specials)
    params = tree_cast(init_model_params(jax.random.key(0), cfg), jnp.bfloat16)

    rtfx = _decode_rtfx(jax, jnp, cfg, params, B, secs, max_new)

    extras = {"max_new_tokens": max_new, "batch": B, "audio_secs": secs}
    try:
        # int8 serving path: w8a8 decoder weights + int8 KV cache — together
        # they halve both dominant HBM streams of the decode step
        from mtasr_tpu.utils.quantize import quantize_decoder_for_serving
        qparams = quantize_decoder_for_serving(params, mode="w8a8")
        extras["rtfx_int8"] = round(_decode_rtfx(
            jax, jnp, cfg, qparams, B, secs, max_new, kv_quant=True), 2)
    except Exception as e:
        extras["int8_bench_error"] = str(e)[:200]
    try:
        from mtasr_tpu.config import (
            SpeechEncoderDecoderConfig as SED,
        )
        tcfg = SED(encoder=enc, decoder=dec, train_mode="hybrid",
                   talker_ctc=True, talker_numbers=2,
                   separator_hidden=896 if on_tpu else 24, **specials)
        # flagship training settings: one compiled layer body (halves the
        # remote compile, round-1 measured 182-230 s unrolled vs 98 s) +
        # per-layer remat (fits B=16 x 10 s hybrid on the 16 GB chip)
        tcfg.encoder.scan_layers = True
        tcfg.decoder.scan_layers = True
        tcfg.encoder.remat = True
        tcfg.decoder.remat = True
        tparams = tree_cast(init_model_params(jax.random.key(1), tcfg),
                            jnp.bfloat16)
        extras["train_samples_per_s"] = round(
            _train_throughput(jax, jnp, tcfg, tparams, train_B,
                              secs if on_tpu else 2), 2)
    except Exception as e:  # keep the headline metric robust
        extras["train_bench_error"] = str(e)[:200]

    baseline = 50.0  # >50x real-time target per chip (BASELINE.md)
    print(json.dumps({
        "metric": "batched_greedy_decode_rtfx",
        "value": round(rtfx, 2),
        "unit": "audio_s_per_s_per_chip",
        "vs_baseline": round(rtfx / baseline, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
