"""Training stack tests: PCGrad math, freeze masks, train step end-to-end,
checkpoint roundtrip + partial restore, LoRA apply/merge, and multi-chip
pjit execution on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mtasr_tpu.config import TrainingConfig
from mtasr_tpu.models.speech_encoder_decoder import init_model_params, model_forward
from mtasr_tpu.parallel.mesh import make_mesh, shard_params, shard_batch
from mtasr_tpu.train.checkpoint import (
    extract_by_prefix, last_checkpoint, load_partial, resume_or_raise,
    restore_checkpoint, save_checkpoint,
)
from mtasr_tpu.train.freeze import freeze_summary, trainable_mask
from mtasr_tpu.train.lora import (
    apply_decoder_lora, init_decoder_lora, merge_decoder_lora,
)
from mtasr_tpu.train.optimizer import make_optimizer
from mtasr_tpu.train.train_step import make_train_step, pcgrad_project
from tests.test_composite import make_batch, tiny_cfg


def _np_pcgrad(gs):
    """Reference projection loop in numpy (trainer_seq2seq.py:1117-1131)."""
    gs = [g.copy() for g in gs]
    K = len(gs)
    for i in range(K):
        for j in range(K):
            if i == j:
                continue
            dot = float(np.dot(gs[i], gs[j]))
            if dot < 0:
                gs[i] = gs[i] - dot / (float(np.dot(gs[j], gs[j])) + 1e-12) * gs[j]
    return np.sum(gs, axis=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_pcgrad_projection_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    K, D = 3, 7
    gs = [rng.standard_normal(D).astype(np.float32) for _ in range(K)]
    ref = _np_pcgrad(gs)
    ours = pcgrad_project([{"w": jnp.asarray(g)} for g in gs])
    np.testing.assert_allclose(np.asarray(ours["w"]), ref, rtol=1e-5, atol=1e-6)


def test_pcgrad_conflicting_grads():
    g1 = {"w": jnp.asarray([1.0, 0.0])}
    g2 = {"w": jnp.asarray([-1.0, 0.5])}
    out = np.asarray(pcgrad_project([g1, g2])["w"])
    ref = _np_pcgrad([np.array([1.0, 0.0]), np.array([-1.0, 0.5])])
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def _setup(mode="hybrid", pcgrad=True):
    cfg = tiny_cfg(train_mode=mode, talker_ctc=(mode != "attention"))
    params = init_model_params(jax.random.key(0), cfg)
    tc = TrainingConfig(pcgrad=pcgrad, learning_rate=1e-3, warmup_steps=2,
                        max_steps=10)
    mask = trainable_mask(params, train_mode=mode, train_all=True)
    opt = make_optimizer(tc, mask)
    wav, amask, arr = make_batch(cfg, seed=2)
    batch = {
        "input_values": jnp.asarray(wav), "audio_mask": jnp.asarray(amask),
        "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"]),
        "ce_labels": jnp.asarray(arr["ce_labels"]),
        "label_spks": jnp.asarray(arr["label_spks"]),
        "label_spk_lens": jnp.asarray(arr["label_spk_lens"]),
    }
    return cfg, tc, params, mask, opt, batch


def test_train_step_runs_with_and_without_pcgrad():
    losses = {}
    for pc in (True, False):
        cfg, tc, params, mask, opt, batch = _setup(pcgrad=pc)
        step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
        state = opt.init(params)
        p2, s2, metrics = step(params, state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
        losses[pc] = float(metrics["loss"])
        # HF-exact schedule: under warmup the FIRST optimizer step runs at
        # lr == 0 (LambdaLR lambda(0) == 0/warmup) — params change from the
        # SECOND step on
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p2)
        assert max(jax.tree_util.tree_leaves(d)) == 0
        p3, _, _ = step(p2, s2, batch, jax.random.key(1))
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), p2, p3)
        assert max(jax.tree_util.tree_leaves(d)) > 0
    # same forward loss regardless of grad surgery
    assert abs(losses[True] - losses[False]) < 1e-4


def test_freeze_mask_blocks_updates():
    cfg, tc, params, _, _, batch = _setup(mode="attention", pcgrad=False)
    # HF-exact schedule runs the first optimizer step at lr == 0 under
    # warmup — use warmup 0 so the single step below actually moves params
    tc = TrainingConfig(pcgrad=False, learning_rate=1e-3, warmup_steps=0,
                        max_steps=10)
    mask = trainable_mask(params, train_mode="attention",
                          freeze_decoder=True,
                          partial_decoder_unfreeze=("lm_head", "embed_tokens"))
    opt = make_optimizer(tc, mask)
    step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
    state = opt.init(params)
    p2, _, _ = step(params, state, batch, jax.random.key(0))
    # frozen: conv feature extractor + decoder layers
    fe0 = params["encoder"]["feature_extractor"]
    fe1 = p2["encoder"]["feature_extractor"]
    for a, b in zip(jax.tree_util.tree_leaves(fe0), jax.tree_util.tree_leaves(fe1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    l0 = params["decoder"]["model"]["layers"]["0"]
    l1 = p2["decoder"]["model"]["layers"]["0"]
    for a, b in zip(jax.tree_util.tree_leaves(l0), jax.tree_util.tree_leaves(l1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable: embed_tokens moved
    e0 = np.asarray(params["decoder"]["model"]["embed_tokens"]["weight"])
    e1 = np.asarray(p2["decoder"]["model"]["embed_tokens"]["weight"])
    assert np.abs(e0 - e1).max() > 0
    summ = freeze_summary(params, mask)
    assert 0 < summ["trainable"] < summ["total"]


def test_async_checkpoint_semantics(tmp_path):
    """save_checkpoint is async by default (orbax background write — the
    reference's HF Trainer stalls on every save). Readers must never see a
    partial write: restore/list/last_checkpoint drain pending saves, and
    retention only deletes checkpoints older than the in-flight one."""
    import os
    from mtasr_tpu.train.checkpoint import wait_for_pending_saves
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    out = str(tmp_path / "exp")
    p10 = save_checkpoint(out, 10, params, extra={"step": np.asarray(10)})
    # immediate restore drains the in-flight write
    tpl = {"params": jax.tree_util.tree_map(np.zeros_like, params),
           "extra": {"step": np.asarray(0)}}
    r = restore_checkpoint(last_checkpoint(out), tpl)
    np.testing.assert_array_equal(np.asarray(r["params"]["w"]),
                                  np.asarray(params["w"]))
    assert int(r["extra"]["step"]) == 10
    # retention composes with a pending async save
    save_checkpoint(out, 20, params, save_total_limit=1)
    wait_for_pending_saves()
    assert last_checkpoint(out).endswith("checkpoint-20")
    assert not os.path.exists(p10)
    # blocking mode still available
    save_checkpoint(out, 30, params, blocking=True)
    assert last_checkpoint(out).endswith("checkpoint-30")


def test_checkpoint_roundtrip_and_partial(tmp_path):
    cfg, tc, params, mask, opt, batch = _setup(mode="attention", pcgrad=False)
    out = str(tmp_path / "exp")
    save_checkpoint(out, 10, params, extra={"step": np.asarray(10)})
    save_checkpoint(out, 20, params, save_total_limit=1)
    assert last_checkpoint(out).endswith("checkpoint-20")
    assert resume_or_raise(out) and resume_or_raise(out).endswith("-20")

    template = {"params": jax.tree_util.tree_map(np.asarray, params)}
    restored = restore_checkpoint(last_checkpoint(out), template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # compositional: extract encoder-only, graft into a fresh model
    donor = extract_by_prefix(params, ("encoder",))
    fresh = init_model_params(jax.random.key(9), cfg)
    grafted = load_partial(fresh, donor, ("encoder",))
    np.testing.assert_array_equal(
        np.asarray(grafted["encoder"]["feature_projection"]["projection"]["weight"]),
        np.asarray(params["encoder"]["feature_projection"]["projection"]["weight"]))

    # vocab-tolerant ctc_lo graft
    cfg2 = tiny_cfg(train_mode="ctc", talker_ctc=True)
    m2 = init_model_params(jax.random.key(1), cfg2)
    donor2 = extract_by_prefix(m2, ("serialized_ctc",))
    import copy
    shrunk = copy.deepcopy(donor2)
    shrunk["serialized_ctc"]["0"]["ctc_lo"]["weight"] = \
        shrunk["serialized_ctc"]["0"]["ctc_lo"]["weight"][:-2]
    shrunk["serialized_ctc"]["0"]["ctc_lo"]["bias"] = \
        shrunk["serialized_ctc"]["0"]["ctc_lo"]["bias"][:-2]
    grafted2 = load_partial(m2, shrunk, ("serialized_ctc",))
    w = np.asarray(grafted2["serialized_ctc"]["0"]["ctc_lo"]["weight"])
    assert w.shape == np.asarray(
        m2["serialized_ctc"]["0"]["ctc_lo"]["weight"]).shape


def test_lora_apply_and_merge():
    cfg, _, params, _, _, _ = _setup(mode="attention", pcgrad=False)
    lora = init_decoder_lora(jax.random.key(0), params["decoder"], r=4,
                             alpha=8.0)
    # B is zero-init -> apply is identity
    eff = apply_decoder_lora(params["decoder"], lora)
    w0 = np.asarray(params["decoder"]["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"])
    np.testing.assert_allclose(
        np.asarray(eff["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"]),
        w0, rtol=1e-6)
    # perturb B, check W' = W + (alpha/r) B @ A
    lora["0"]["q_proj"]["lora_B"] = jnp.ones_like(lora["0"]["q_proj"]["lora_B"])
    eff = apply_decoder_lora(params["decoder"], lora)
    delta = 2.0 * np.ones((w0.shape[0], 4)) @ np.asarray(lora["0"]["q_proj"]["lora_A"])
    np.testing.assert_allclose(
        np.asarray(eff["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"]),
        w0 + delta, rtol=1e-4)
    merged = merge_decoder_lora({**params, "decoder_lora": lora})
    assert "decoder_lora" not in merged
    np.testing.assert_allclose(
        np.asarray(merged["decoder"]["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"]),
        w0 + delta, rtol=1e-4)


def test_multichip_train_step_on_mesh():
    """Full train step over a ('data','model') mesh on 8 virtual devices —
    the dryrun_multichip path."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    from jax.sharding import NamedSharding, PartitionSpec as P
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    params = init_model_params(jax.random.key(0), cfg)
    tc = TrainingConfig(pcgrad=True, learning_rate=1e-3, warmup_steps=2,
                        max_steps=10)
    mask = trainable_mask(params, train_mode="hybrid", train_all=True)
    opt = make_optimizer(tc, mask)
    wav, amask, arr = make_batch(cfg, B=4, seed=2)
    batch = {
        "input_values": jnp.asarray(wav), "audio_mask": jnp.asarray(amask),
        "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"]),
        "ce_labels": jnp.asarray(arr["ce_labels"]),
        "label_spks": jnp.asarray(arr["label_spks"]),
        "label_spk_lens": jnp.asarray(arr["label_spk_lens"]),
    }
    mesh = make_mesh(dp_size=4, tp_size=2)
    params_sh = shard_params(params, mesh)
    batch_sh = {
        k: jax.device_put(v, NamedSharding(
            mesh, P(None, "data") if k.startswith("label_spk") else P("data")))
        for k, v in batch.items()}
    step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
    state = opt.init(params_sh)
    with mesh:
        p2, s2, metrics = step(params_sh, state, batch_sh, jax.random.key(0))
        loss_mesh = float(metrics["loss"])
    # compare vs single-device result
    step1 = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
    _, _, m1 = step1(params, opt.init(params), batch, jax.random.key(0))
    assert abs(loss_mesh - float(m1["loss"])) < 1e-3


def test_pcgrad_only_rewrites_shared_subtree():
    """PCGrad replaces encoder+separator grads with the projected CTC sum
    (reference overwrite, trainer_seq2seq.py:1140-1144) but must leave the
    decoder/ctc-head updates identical to the plain backward."""
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    params = init_model_params(jax.random.key(5), cfg)
    wav, amask, arr = make_batch(cfg, seed=4)
    batch = {"input_values": jnp.asarray(wav), "audio_mask": jnp.asarray(amask),
             "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"]),
             "ce_labels": jnp.asarray(arr["ce_labels"]),
             "label_spks": jnp.asarray(arr["label_spks"]),
             "label_spk_lens": jnp.asarray(arr["label_spk_lens"])}
    mask = trainable_mask(params, train_mode="hybrid", train_all=True)
    results = {}
    for pc in (True, False):
        # huge max_grad_norm: global-norm clipping would couple the subtrees
        # (the clip scale depends on the rewritten shared grads — faithful
        # to the reference, which clips after the overwrite)
        # warmup 0: the HF-exact schedule's first step under warmup>0 is
        # a no-op (lr == 0), which would make this single-step test vacuous
        tc = TrainingConfig(pcgrad=pc, learning_rate=1e-3, warmup_steps=0,
                            max_steps=10, max_grad_norm=1e9)
        opt = make_optimizer(tc, mask)
        step = make_train_step(cfg, tc, opt, trainable_mask=mask,
                               donate=False)
        p2, _, _ = step(params, opt.init(params), batch, jax.random.key(0))
        results[pc] = p2
    # decoder + ctc heads: identical updates
    for key in ("decoder", "serialized_ctc"):
        for a, b in zip(jax.tree_util.tree_leaves(results[True][key]),
                        jax.tree_util.tree_leaves(results[False][key])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
    # encoder + separator: different updates (CE grad dropped, CTC projected)
    for key in ("encoder", "separator"):
        diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
            jax.tree_util.tree_leaves(results[True][key]),
            jax.tree_util.tree_leaves(results[False][key])))
        assert diff > 0, key


def test_pcgrad_split_matches_joint_linearization():
    """The two-stage (trunk/post) PCGrad linearization in make_train_step
    must produce exactly the gradients of a joint single-graph form — the
    direct analog of the reference's K autograd.grad calls on one retained
    graph (trainer_seq2seq.py:1106-1144). Grads are recovered from an
    SGD(1.0) step: p_new = p - g."""
    from mtasr_tpu.train.train_step import _mask_tree, _split_shared
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    params = init_model_params(jax.random.key(7), cfg)
    mask = trainable_mask(params, train_mode="hybrid", train_all=True)
    wav, amask, arr = make_batch(cfg, seed=3)
    batch = {
        "input_values": jnp.asarray(wav), "audio_mask": jnp.asarray(amask),
        "decoder_input_ids": jnp.asarray(arr["decoder_input_ids"]),
        "ce_labels": jnp.asarray(arr["ce_labels"]),
        "label_spks": jnp.asarray(arr["label_spks"]),
        "label_spk_lens": jnp.asarray(arr["label_spk_lens"]),
    }
    rng = jax.random.key(11)
    tc = TrainingConfig(pcgrad=True, learning_rate=1.0, warmup_steps=1,
                        max_steps=10)
    sgd = optax.sgd(1.0)
    step = make_train_step(cfg, tc, sgd, trainable_mask=mask, donate=False)
    p2, _, _ = step(params, sgd.init(params), batch, rng)
    g_split = jax.tree_util.tree_map(lambda a, b: (a - b).astype(jnp.float32),
                                     params, p2)

    # joint form: one vjp over the full graph, K head pullbacks + total
    shared0, rest0 = _split_shared(params)

    def loss_all(shared, rest):
        p = {**shared, **rest}
        out = model_forward(
            p, cfg, batch["input_values"], batch["audio_mask"],
            batch["decoder_input_ids"], splice_index=1,
            ce_labels=batch["ce_labels"], label_spks=batch["label_spks"],
            label_spk_lens=batch["label_spk_lens"],
            deterministic=False, rng=rng, use_pit=False)
        heads = jnp.mean(out.aux["ctc_per_head"], axis=1)
        return out.loss, heads

    (loss, heads), vjp_fn = jax.vjp(loss_all, shared0, rest0)
    K = int(heads.shape[0])
    _, g_rest = vjp_fn((jnp.ones_like(loss), jnp.zeros_like(heads)))
    m_shared, _ = _split_shared(mask)
    head_grads = []
    for i in range(K):
        e = jnp.zeros_like(heads).at[i].set(1.0)
        g_i, _ = vjp_fn((jnp.zeros_like(loss), e))
        head_grads.append(_mask_tree(g_i, m_shared))
    g_joint = {**pcgrad_project(head_grads), **g_rest}

    flat_s, tdef_s = jax.tree_util.tree_flatten(g_split)
    flat_j, tdef_j = jax.tree_util.tree_flatten(g_joint)
    assert tdef_s == tdef_j
    # scale-aware: the split path runs jitted, the joint reference eagerly,
    # so leaves differ by f32 reassociation noise (measured <=3e-4 rel of
    # the leaf's max-abs; exact-0 eagerly vs ~1e-7 jitted on dead biases)
    for a, b in zip(flat_s, flat_j):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        tol = 1e-6 + 1e-3 * (np.max(np.abs(b)) if b.size else 0.0)
        assert np.max(np.abs(a - b)) <= tol if a.size else True


def test_pcgrad_per_head_grad_norm_metrics():
    cfg, tc, params, mask, opt, batch = _setup(mode="hybrid", pcgrad=True)
    step = make_train_step(cfg, tc, opt, trainable_mask=mask, donate=False)
    _, _, metrics = step(params, opt.init(params), batch, jax.random.key(0))
    norms = np.asarray(metrics["ctc_head_grad_norms"])
    assert norms.shape == (cfg.talker_numbers,)
    assert np.all(norms > 0)
