"""Speculative decoding exactness + speedup on a TRAINED model, on TPU.

DESIGN.md round 3e measured only ~44% sequence agreement for the L=5
verify chunk on a RANDOM-INIT model on TPU bf16 and argued trained-model
argmax margins make the path exact. This converts that argument into a
measurement (VERDICT r3 next-round #4): memorize a handful of SOT
utterances on-chip (the 24 s "end-to-end learning proof" recipe, DESIGN.md
round 3), then decode the SAME model with plain greedy and with
`--speculative ctc` and require token identity on the hardware the path
targets, recording CTC-draft acceptance rate and decode speedup in the
small-batch regime where speculation wins (DESIGN round 3e regime table).

Importable (`run()` returns a bench-extras dict) and runnable standalone.
Reference anchor: greedy decode loop utils/generation_utils.py:3166; the
reference has no speculative path (beyond-parity feature, PARITY.md).
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PAD, SC, BOS, EOS = 2040, 2041, 1, 2
VOCAB = 2048


def _tiny_cfg():
    from mtasr_tpu.config import (
        LlamaConfig, SpeechEncoderDecoderConfig, WavLMConfig,
    )
    enc = WavLMConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32, 32), conv_stride=(5, 4),
        conv_kernel=(10, 5), num_buckets=32, max_bucket_distance=40,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        add_adapter=True, num_adapter_layers=2, output_hidden_size=64,
        mask_time_prob=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True)
    dec = LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0, bos_token_id=BOS, eos_token_id=EOS)
    return SpeechEncoderDecoderConfig(
        encoder=enc, decoder=dec, train_mode="hybrid", talker_ctc=True,
        talker_numbers=2, pad_token_id=PAD, sc_token_id=SC,
        eos_token_id=EOS, bos_token_id=BOS, decoder_start_token_id=BOS,
        separator_hidden=32)


def _memorize_batch(cfg, B=4, S=16000, seed=7):
    """B SOT utterances (spk1 <sc> spk2, ~20 tokens) with fixed wavs."""
    from mtasr_tpu.data.labels import build_training_arrays
    rng = np.random.default_rng(seed)
    wav = rng.standard_normal((B, S)).astype(np.float32)
    amask = np.ones((B, S), np.int32)
    rows = []
    for _ in range(B):
        l1, l2 = rng.integers(8, 12), rng.integers(8, 12)
        rows.append(list(rng.integers(3, 512, l1)) + [SC]
                    + list(rng.integers(3, 512, l2)))
    # +1 pad slot: insert_eos places eos at each row's first -100 slot
    # (reference forward 699-710) — a full row would get NO eos
    # supervision and greedy decode would overrun the label at max length
    L = max(len(r) for r in rows) + 1
    labels = np.full((B, L), -100, np.int64)
    for b, r in enumerate(rows):
        labels[b, :len(r)] = r
    arr = build_training_arrays(
        labels, pad_token_id=PAD, decoder_start_token_id=BOS,
        eos_token_id=EOS, sc_token_id=SC,
        talker_numbers=cfg.talker_numbers, instruct=False)
    return wav, amask, arr, rows


def run(budget_s: float = 240.0, max_steps: int = 4000,
        spec_k: int = 4) -> dict:
    import jax
    import jax.numpy as jnp

    from mtasr_tpu.config import GenerationConfig, TrainingConfig
    from mtasr_tpu.generate import generate
    from mtasr_tpu.generate.speculative import generate_speculative
    from mtasr_tpu.models.speech_encoder_decoder import init_model_params
    from mtasr_tpu.train.freeze import trainable_mask
    from mtasr_tpu.train.optimizer import make_optimizer
    from mtasr_tpu.train.train_step import make_train_step

    t_end = time.perf_counter() + budget_s
    cfg = _tiny_cfg()
    params = init_model_params(jax.random.key(0), cfg)
    wav, amask, arr, rows = _memorize_batch(cfg)
    batch = {
        "input_values": jnp.asarray(wav), "audio_mask": jnp.asarray(amask),
        "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"]),
        "ce_labels": jnp.asarray(arr["ce_labels"]),
        "label_spks": jnp.asarray(arr["label_spks"]),
        "label_spk_lens": jnp.asarray(arr["label_spk_lens"]),
    }
    tc = TrainingConfig(pcgrad=True, learning_rate=3e-3, warmup_steps=20,
                        max_steps=max_steps)
    mask = trainable_mask(params, train_mode="hybrid", train_all=True)
    opt = make_optimizer(tc, mask)
    step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
    state = opt.init(params)
    loss = float("nan")
    steps_run = 0
    for i in range(max_steps):
        params, state, metrics = step(params, state, batch,
                                      jax.random.key(i))
        steps_run = i + 1
        if i % 50 == 49 or i == 0:
            loss = float(metrics["loss"])   # host sync only when sampled
            if loss < 5e-3 or time.perf_counter() > t_end:
                break

    max_new = max(len(r) for r in rows) + 2   # room for <eos>
    wav_j, amask_j = jnp.asarray(wav), jnp.asarray(amask)
    g = generate(params, cfg, wav_j, amask_j,
                 gen=GenerationConfig(do_sample=False),
                 max_new_tokens=max_new)
    np.asarray(g.sequences)
    sgen = GenerationConfig(do_sample=False, speculative="ctc",
                            spec_k=spec_k)
    s, stats = generate_speculative(params, cfg, wav_j, amask_j, gen=sgen,
                                    max_new_tokens=max_new)
    exact = bool(np.array_equal(np.asarray(g.sequences),
                                np.asarray(s.sequences)))
    emitted = int(np.asarray(stats.emitted).sum())
    accepted = int(np.asarray(stats.accepted_drafts))
    spec_steps = int(np.asarray(stats.spec_steps))
    # accepted_drafts sums accepted tokens across ALL B rows per verify
    # step (speculative.py:192-196), so the opportunity count is
    # spec_steps * spec_k * B (advisor round-4: without the B factor the
    # rate is inflated B-fold and can exceed 1.0)
    B = wav.shape[0]
    accept_rate = accepted / max(1, spec_steps * spec_k * B)

    def _time(fn, iters=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    dt_g = _time(lambda: np.asarray(
        generate(params, cfg, wav_j, amask_j,
                 gen=GenerationConfig(do_sample=False),
                 max_new_tokens=max_new).sequences))
    dt_s = _time(lambda: np.asarray(
        generate_speculative(params, cfg, wav_j, amask_j, gen=sgen,
                             max_new_tokens=max_new)[0].sequences))

    # did it actually memorize? greedy must reproduce every label row
    # (token-for-token incl. <sc>), else the margins claim is untested
    memorized = all(
        [int(t) for t in np.asarray(g.sequences)[b][:len(rows[b]) + 1]]
        == rows[b] + [EOS]
        for b in range(len(rows)))

    return {
        "spec_trained_loss": round(loss, 5),
        "spec_trained_steps": steps_run,
        "spec_trained_memorized": memorized,
        "spec_trained_exact": exact,
        "spec_trained_accept_rate": round(accept_rate, 3),
        "spec_trained_emitted": emitted,
        "spec_trained_speedup": round(dt_g / dt_s, 3),
    }


if __name__ == "__main__":
    import jax
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    out = run(budget_s=float(sys.argv[1]) if len(sys.argv) > 1 else 240.0)
    print(out)
