"""Remat (gradient checkpointing) and gradient accumulation tests."""
import numpy as np

import jax
import jax.numpy as jnp

from mtasr_tpu.config import TrainingConfig
from mtasr_tpu.models.speech_encoder_decoder import init_model_params, model_forward
from mtasr_tpu.train.freeze import trainable_mask
from mtasr_tpu.train.optimizer import make_optimizer
from mtasr_tpu.train.train_step import make_train_step
from tests.test_composite import make_batch, tiny_cfg


def _loss_and_grad(cfg, params, wav, amask, arr):
    def loss_fn(p):
        return model_forward(
            p, cfg, jnp.asarray(wav), jnp.asarray(amask),
            jnp.asarray(arr["decoder_input_ids"]), splice_index=1,
            ce_labels=jnp.asarray(arr["ce_labels"]),
            label_spks=jnp.asarray(arr["label_spks"]),
            label_spk_lens=jnp.asarray(arr["label_spk_lens"])).loss
    return jax.value_and_grad(loss_fn)(params)


def test_remat_grads_match_no_remat():
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    params = init_model_params(jax.random.key(0), cfg)
    wav, amask, arr = make_batch(cfg, seed=7)
    l0, g0 = _loss_and_grad(cfg, params, wav, amask, arr)
    cfg.encoder.remat = True
    cfg.decoder.remat = True
    l1, g1 = _loss_and_grad(cfg, params, wav, amask, arr)
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_gradient_accumulation():
    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(1), cfg)
    tc = TrainingConfig(pcgrad=False, learning_rate=1e-3, warmup_steps=1,
                        max_steps=10, gradient_accumulation_steps=2)
    mask = trainable_mask(params, train_mode="attention", train_all=True)
    opt = make_optimizer(tc, mask)
    step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
    state = opt.init(params)
    wav, amask, arr = make_batch(cfg, seed=8)
    batch = {"input_values": jnp.asarray(wav), "audio_mask": jnp.asarray(amask),
             "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"]),
             "ce_labels": jnp.asarray(arr["ce_labels"])}
    # first micro-step: no param change (updates deferred)
    p1, s1, _ = step(params, state, batch, jax.random.key(0))
    d1 = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p1)))
    assert d1 == 0.0
    # second micro-step: the FIRST applied update fires — but under the
    # HF-exact LambdaLR indexing (optimizer.py:30-41, pinned by the trainer
    # A/B) optimizer step 0 runs at lr == lambda(0) == 0 with warmup_steps=1,
    # so the param delta is exactly zero even though the update applied.
    p2, s2, _ = step(p1, s1, batch, jax.random.key(1))
    d2 = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)))
    assert d2 == 0.0
    # third+fourth micro-steps: the SECOND applied update runs at the
    # post-warmup lr and must move params.
    p3, s3, _ = step(p2, s2, batch, jax.random.key(2))
    d3 = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p3)))
    assert d3 == 0.0  # micro-step: deferred
    p4, s4, _ = step(p3, s3, batch, jax.random.key(3))
    d4 = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(p3), jax.tree_util.tree_leaves(p4)))
    assert d4 > 0.0
