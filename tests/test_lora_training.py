"""LoRA must actually train: gradient flow into lora_A/lora_B, frozen base
weights, activation-level forward == merged-weight forward, dropout behavior,
and a short LoRA-only run that reduces loss (the reference recipe
freeze_decoder + use_lora -> train -> merge -> decode,
/root/reference/src/insert_adapter_decoder.py:30-73 +
utils/merge_adapter.py:15-82)."""
import numpy as np

import jax
import jax.numpy as jnp

from mtasr_tpu.config import TrainingConfig
from mtasr_tpu.models.speech_encoder_decoder import (
    init_model_params, model_forward,
)
from mtasr_tpu.train.freeze import trainable_mask
from mtasr_tpu.train.lora import init_decoder_lora, merge_decoder_lora
from mtasr_tpu.train.optimizer import make_optimizer
from mtasr_tpu.train.train_step import make_train_step
from tests.test_composite import make_batch, tiny_cfg


def _params_with_lora(cfg, r=4, seed=0, randomize_b=False):
    params = init_model_params(jax.random.key(seed), cfg)
    params["decoder_lora"] = init_decoder_lora(
        jax.random.key(seed + 1), params["decoder"], r=r, alpha=2.0 * r)
    if randomize_b:
        lora = params["decoder_lora"]
        for li, projs in lora.items():
            if li == "__meta__":
                continue
            for proj, ab in projs.items():
                ab["lora_B"] = jax.random.normal(
                    jax.random.fold_in(jax.random.key(7), hash((li, proj)) % 2**31),
                    ab["lora_B"].shape, ab["lora_B"].dtype) * 0.02
    return params


def _jbatch(cfg, seed=2):
    wav, amask, arr = make_batch(cfg, seed=seed)
    return {
        "input_values": jnp.asarray(wav), "audio_mask": jnp.asarray(amask),
        "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"]),
        "ce_labels": jnp.asarray(arr["ce_labels"]),
        "label_spks": jnp.asarray(arr["label_spks"]),
        "label_spk_lens": jnp.asarray(arr["label_spk_lens"]),
    }


def _loss_fn(cfg, batch, deterministic=True, rng=None):
    def f(params):
        out = model_forward(
            params, cfg, batch["input_values"], batch["audio_mask"],
            batch["decoder_input_ids"], splice_index=1,
            ce_labels=batch["ce_labels"], label_spks=batch["label_spks"],
            label_spk_lens=batch["label_spk_lens"],
            deterministic=deterministic, rng=rng)
        return out.loss
    return f


def test_lora_b_grads_nonzero():
    cfg = tiny_cfg(train_mode="attention", talker_ctc=False)
    cfg.lora_dropout = 0.0
    params = _params_with_lora(cfg)
    grads = jax.grad(_loss_fn(cfg, _jbatch(cfg)))(params)
    gl = grads["decoder_lora"]
    b_norms = [float(jnp.linalg.norm(ab["lora_B"]))
               for li, projs in gl.items() if li != "__meta__"
               for ab in projs.values()]
    a_norms = [float(jnp.linalg.norm(ab["lora_A"]))
               for li, projs in gl.items() if li != "__meta__"
               for ab in projs.values()]
    # dL/dB = (...) @ A^T != 0; dL/dA = B^T (...) == 0 exactly at init (B=0)
    assert max(b_norms) > 0
    assert max(a_norms) == 0
    # once B is nonzero, A receives gradient too
    params2 = _params_with_lora(cfg, randomize_b=True)
    gl2 = jax.grad(_loss_fn(cfg, _jbatch(cfg)))(params2)["decoder_lora"]
    a2 = [float(jnp.linalg.norm(ab["lora_A"]))
          for li, projs in gl2.items() if li != "__meta__"
          for ab in projs.values()]
    assert max(a2) > 0


def test_lora_activation_matches_merged_weights():
    cfg = tiny_cfg(train_mode="attention", talker_ctc=False)
    cfg.lora_dropout = 0.0
    params = _params_with_lora(cfg, randomize_b=True)
    batch = _jbatch(cfg)
    loss_act = float(_loss_fn(cfg, batch)(params))
    merged = merge_decoder_lora(params)
    assert "decoder_lora" not in merged
    loss_merged = float(_loss_fn(cfg, batch)(merged))
    np.testing.assert_allclose(loss_act, loss_merged, rtol=2e-5)
    # and the LoRA delta actually changes the forward vs the raw base
    base = {k: v for k, v in params.items() if k != "decoder_lora"}
    loss_base = float(_loss_fn(cfg, batch)(base))
    assert abs(loss_base - loss_act) > 1e-6


def test_lora_dropout_only_in_training():
    cfg = tiny_cfg(train_mode="attention", talker_ctc=False)
    cfg.lora_dropout = 0.5
    params = _params_with_lora(cfg, randomize_b=True)
    batch = _jbatch(cfg)
    # deterministic: dropout off, reproducible
    l1 = float(_loss_fn(cfg, batch, deterministic=True)(params))
    l2 = float(_loss_fn(cfg, batch, deterministic=True)(params))
    assert l1 == l2
    # training mode: two rng streams -> different losses
    t1 = float(_loss_fn(cfg, batch, deterministic=False,
                        rng=jax.random.key(0))(params))
    t2 = float(_loss_fn(cfg, batch, deterministic=False,
                        rng=jax.random.key(1))(params))
    assert t1 != t2


def test_lora_only_training_learns_and_base_frozen():
    cfg = tiny_cfg(train_mode="attention", talker_ctc=False)
    cfg.lora_dropout = 0.0   # tiny model: keep the signal clean
    params = _params_with_lora(cfg)
    mask = trainable_mask(params, train_mode="attention",
                          freeze_encoder=True, freeze_decoder=True,
                          partial_encoder_unfreeze=(),
                          partial_decoder_unfreeze=(),
                          partial_others_unfreeze=())
    # only LoRA (and the always-on encoder adapter/enc_to_dec_proj rules)
    # are trainable; decoder base must be fully frozen
    # max_steps=500 keeps the linear-decay schedule near-constant over the
    # 50 steps actually run (decay-to-zero would flatline the tail)
    tc = TrainingConfig(pcgrad=False, learning_rate=3e-3, warmup_steps=2,
                        max_steps=500, weight_decay=0.0)
    opt = make_optimizer(tc, mask)
    step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
    state = opt.init(params)
    batch = _jbatch(cfg)
    losses = []
    p = params
    for i in range(50):
        p, state, metrics = step(p, state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.15, losses[:3] + losses[-3:]
    # base decoder weights bitwise unchanged
    for a, b in zip(jax.tree_util.tree_leaves(params["decoder"]),
                    jax.tree_util.tree_leaves(p["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # LoRA B moved
    moved = [float(jnp.max(jnp.abs(
                 projs[name]["lora_B"] - p["decoder_lora"][li][name]["lora_B"])))
             for li, projs in params["decoder_lora"].items()
             if li != "__meta__"
             for name in projs]
    assert max(moved) > 0
    # merge -> decode path: merged model == final activation-level model
    merged = merge_decoder_lora(p)
    lm = float(_loss_fn(cfg, batch)(merged))
    la = float(_loss_fn(cfg, batch)(p))
    np.testing.assert_allclose(lm, la, rtol=2e-5)
