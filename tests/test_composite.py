"""Composite model tests: label surgery invariants, forward/loss shapes,
gradient flow, CTC one-shot decode, and end-to-end overfit on a tiny batch
(the reference's only integration signal is 'loss decreases on the mini
fixture' — SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mtasr_tpu.config import (
    LlamaConfig, SpeechEncoderDecoderConfig, WavLMConfig,
)
from mtasr_tpu.data.labels import (
    build_training_arrays, insert_eos, shift_tokens_right,
    split_k_speakers_and_lengths,
)
from mtasr_tpu.models.speech_encoder_decoder import (
    forward_ctc, init_model_params, model_forward,
)

VOCAB = 64
PAD = 50
SC = 51
EOS = 2
BOS = 1


def tiny_cfg(**kw):
    enc = WavLMConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=48, conv_dim=(8, 8), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_buckets=16, max_bucket_distance=20,
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
        add_adapter=True, num_adapter_layers=3, output_hidden_size=16,
        mask_time_prob=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True)
    dec = LlamaConfig(
        vocab_size=VOCAB, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=6, rope_theta=10000.0, bos_token_id=BOS, eos_token_id=EOS)
    base = dict(encoder=enc, decoder=dec, pad_token_id=PAD, sc_token_id=SC,
                eos_token_id=EOS, bos_token_id=BOS, decoder_start_token_id=BOS,
                separator_hidden=20)
    base.update(kw)
    return SpeechEncoderDecoderConfig(**base)


def make_batch(cfg, B=2, S=8000, seed=0):
    rng = np.random.default_rng(seed)
    wav = rng.standard_normal((B, S)).astype(np.float32)
    amask = np.ones((B, S), np.int32)
    amask[-1, S // 2:] = 0
    # SOT labels: spk1 <sc> spk2, -100 padded
    rows = []
    for b in range(B):
        l1 = rng.integers(3, 6)
        l2 = rng.integers(3, 6)
        row = list(rng.integers(3, 40, l1)) + [SC] + list(rng.integers(3, 40, l2))
        rows.append(row)
    L = max(len(r) for r in rows)
    labels = np.full((B, L), -100, np.int64)
    for b, r in enumerate(rows):
        labels[b, :len(r)] = r
    arrays = build_training_arrays(
        labels, pad_token_id=PAD, decoder_start_token_id=BOS,
        eos_token_id=EOS, sc_token_id=SC,
        talker_numbers=cfg.talker_numbers, instruct=False)
    return wav, amask, arrays


def test_label_surgery_invariants():
    labels = np.array([[5, 6, SC, 7, 8, 9], [4, SC, 3, -100, -100, -100]])
    ids = shift_tokens_right(labels, PAD, BOS)
    np.testing.assert_array_equal(ids[0], [BOS, 5, 6, SC, 7, 8])
    np.testing.assert_array_equal(ids[1], [BOS, 4, SC, 3, PAD, PAD])

    withe = insert_eos(labels.copy(), EOS)
    np.testing.assert_array_equal(withe[0], [5, 6, SC, 7, 8, 9, EOS])
    np.testing.assert_array_equal(withe[1], [4, SC, 3, EOS, -100, -100, -100])

    spks, lens = split_k_speakers_and_lengths(
        labels, 2, SC, PAD, end_token_id=-100)
    np.testing.assert_array_equal(lens, [[2, 1], [3, 1]])
    np.testing.assert_array_equal(spks[0, 0, :2], [5, 6])
    np.testing.assert_array_equal(spks[1, 0, :3], [7, 8, 9])
    np.testing.assert_array_equal(spks[1, 1, :1], [3])

    with pytest.raises(ValueError):
        split_k_speakers_and_lengths(labels, 3, SC, PAD, end_token_id=-100)


@pytest.mark.parametrize("mode", ["attention", "ctc", "hybrid"])
def test_forward_loss_and_gradients(mode):
    cfg = tiny_cfg(train_mode=mode, talker_ctc=(mode != "attention"))
    params = init_model_params(jax.random.key(0), cfg)
    wav, amask, arr = make_batch(cfg)

    def loss_fn(p):
        out = model_forward(
            p, cfg, jnp.asarray(wav), jnp.asarray(amask),
            jnp.asarray(arr["decoder_input_ids"]),
            splice_index=arr["splice_index"],
            ce_labels=jnp.asarray(arr["ce_labels"]),
            label_spks=jnp.asarray(arr["label_spks"]),
            label_spk_lens=jnp.asarray(arr["label_spk_lens"]))
        return out.loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(jnp.any(g != 0)) for _, g in flat)
    assert nonzero > len(flat) * 0.5
    if mode == "ctc":
        # CE path unused: decoder grads must be zero
        dec_grads = jax.tree_util.tree_leaves(grads["decoder"])
        assert all(not bool(jnp.any(g != 0)) for g in dec_grads)
    if mode != "attention":
        sep_grads = jax.tree_util.tree_leaves(grads["separator"])
        assert any(bool(jnp.any(g != 0)) for g in sep_grads)


def test_logits_shape_and_speech_prefix_ignored():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(0), cfg)
    wav, amask, arr = make_batch(cfg)
    out = model_forward(
        params, cfg, jnp.asarray(wav), jnp.asarray(amask),
        jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
        ce_labels=jnp.asarray(arr["ce_labels"]))
    S = wav.shape[1]
    T8 = cfg.encoder.adapter_output_length(cfg.encoder.conv_output_length(S))
    L = arr["decoder_input_ids"].shape[1]
    assert out.logits.shape == (wav.shape[0], T8 + L, VOCAB)
    assert float(out.aux["loss_attn"]) > 0


def test_forward_ctc_decode_shapes():
    cfg = tiny_cfg(train_mode="ctc", talker_ctc=True)
    params = init_model_params(jax.random.key(0), cfg)
    wav, amask, _ = make_batch(cfg)
    trans, lens = forward_ctc(params, cfg, jnp.asarray(wav),
                              jnp.asarray(amask), max_out_len=10)
    assert trans.shape == (2, 2 * 10)
    assert lens.shape == (2, 2)
    assert np.all(np.asarray(lens) >= 0)


@pytest.mark.parametrize("mode", ["attention", "ctc"])
def test_overfit_tiny_batch(mode):
    """End-to-end learning signal (SURVEY.md §7 step 4/6 acceptance)."""
    cfg = tiny_cfg(train_mode=mode, talker_ctc=(mode != "attention"))
    params = init_model_params(jax.random.key(1), cfg)
    wav, amask, arr = make_batch(cfg, seed=3)
    batch = {k: jnp.asarray(v) for k, v in arr.items() if k != "splice_index"}

    def loss_fn(p):
        return model_forward(
            p, cfg, jnp.asarray(wav), jnp.asarray(amask),
            batch["decoder_input_ids"], splice_index=1,
            ce_labels=batch["ce_labels"], label_spks=batch["label_spks"],
            label_spk_lens=batch["label_spk_lens"]).loss

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    first = None
    for i in range(60):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < first * 0.5, f"{mode}: no learning: {first} -> {final}"


def test_instruct_layout():
    cfg = tiny_cfg(train_mode="attention", instruct=True,
                   bosp_token_id=52, eosp_token_id=53, boss_token_id=54,
                   eoss_token_id=55, bosr_token_id=56, eosr_token_id=57)
    P = 3
    resp = [10, 11, SC, 12, 13]
    row = [52] + [20, 21, 22] + [53, 54, 55, 56] + resp + [57]
    labels = np.asarray([row, row], np.int64)
    arr = build_training_arrays(
        labels, pad_token_id=PAD, decoder_start_token_id=BOS,
        eos_token_id=EOS, sc_token_id=SC, talker_numbers=2, instruct=True,
        eosr_token_id=57, bosp_token_id=52, eosp_token_id=53, bosr_token_id=56)
    assert arr["splice_index"] == P + 4
    np.testing.assert_array_equal(arr["label_spks"][0, 0, :2], [10, 11])
    np.testing.assert_array_equal(arr["label_spks"][1, 0, :2], [12, 13])

    params = init_model_params(jax.random.key(0), cfg)
    wav = np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32)
    amask = np.ones((2, 8000), np.int32)
    out = model_forward(
        params, cfg, jnp.asarray(wav), jnp.asarray(amask),
        jnp.asarray(arr["decoder_input_ids"]),
        splice_index=arr["splice_index"],
        ce_labels=jnp.asarray(arr["ce_labels"]))
    T8 = cfg.encoder.adapter_output_length(cfg.encoder.conv_output_length(8000))
    assert out.logits.shape[1] == T8 + arr["decoder_input_ids"].shape[1]
    assert np.isfinite(float(out.loss))
