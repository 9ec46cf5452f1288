"""Jitted train/eval steps with PCGrad multi-head gradient surgery.

PCGrad re-designs the reference's training_step
(/root/reference/src/trainer_seq2seq.py:1005-1148):

* reference: K separate `torch.autograd.grad` calls on the retained graph +
  1 main backward (K+1 full backwards)
* here: ONE `jax.vjp` linearization shared by the total-loss pullback and
  the K per-head pullbacks — the forward is computed once; each pullback is
  one backward pass through the shared encoder/separator subtree

Projection semantics are kept bit-exact with the reference loop
(trainer_seq2seq.py:1117-1131): sequential in-place i/j sweep, project
g_i -= (g_i.g_j / ||g_j||^2) g_j whenever the dot is negative, then the
SUM of projected per-head grads REPLACES the total-loss gradient on the
shared (encoder + separator) params — including discarding the CE
contribution there, exactly as the reference overwrite does
(trainer_seq2seq.py:1140-1144). Only trainable shared params participate
(the reference filters requires_grad).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mtasr_tpu.config import SpeechEncoderDecoderConfig, TrainingConfig
from mtasr_tpu.models.losses import serialized_ctc_loss
from mtasr_tpu.models.speech_encoder_decoder import (
    _ctc_head_list, bridge_features, encode_feats, model_forward,
    model_forward_from_enc,
)

SHARED_TOPS = ("encoder", "separator")


def _tree_dot(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32))
               for x, y in zip(leaves_a, leaves_b))


def _tree_scale_sub(a, b, alpha):
    return jax.tree_util.tree_map(
        lambda x, y: x - alpha.astype(x.dtype) * y, a, b)


def _tree_add(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def _mask_tree(tree, mask):
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), tree, mask)


def pcgrad_project(head_grads):
    """head_grads: list of K pytrees (shared-subtree grads). Returns their
    PCGrad-projected sum, using the reference's sequential sweep."""
    grads = list(head_grads)
    K = len(grads)
    for i in range(K):
        for j in range(K):
            if i == j:
                continue
            dot = _tree_dot(grads[i], grads[j])
            norm2 = _tree_dot(grads[j], grads[j]) + 1e-12
            alpha = jnp.where(dot < 0, dot / norm2, 0.0)
            grads[i] = _tree_scale_sub(grads[i], grads[j], alpha)
    out = grads[0]
    for i in range(1, K):
        out = _tree_add(out, grads[i])
    return out


def _split_shared(tree: dict):
    shared = {k: v for k, v in tree.items() if k in SHARED_TOPS}
    rest = {k: v for k, v in tree.items() if k not in SHARED_TOPS}
    return shared, rest


def make_train_step(
    cfg: SpeechEncoderDecoderConfig,
    tc: TrainingConfig,
    optimizer: optax.GradientTransformation,
    *,
    splice_index: int = 1,
    trainable_mask: Optional[dict] = None,
    use_pit: bool = False,
    donate: bool = True,
) -> Callable:
    """Returns jitted train_step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics).

    batch keys: input_values, audio_mask, decoder_input_ids, ce_labels,
    label_spks, label_spk_lens, [mask_time_indices].
    """
    use_pcgrad = (tc.pcgrad and cfg.talker_ctc and cfg.talker_numbers >= 2
                  and cfg.train_mode in ("ctc", "hybrid"))

    def forward(params, batch, rng):
        out = model_forward(
            params, cfg,
            batch["input_values"], batch.get("audio_mask"),
            batch["decoder_input_ids"], splice_index=splice_index,
            ce_labels=batch.get("ce_labels"),
            label_spks=batch.get("label_spks"),
            label_spk_lens=batch.get("label_spk_lens"),
            mask_time_indices=batch.get("mask_time_indices"),
            deterministic=False, rng=rng, use_pit=use_pit)
        return out

    def step(params, opt_state, batch, rng):
        if not use_pcgrad:
            def loss_fn(p):
                out = forward(p, batch, rng)
                return out.loss, out.aux
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        elif use_pit:
            # PIT chooses a per-sample permutation inside the loss, which
            # the head-only pullback below cannot re-express (its `perm`
            # knob is a single static list) — keep the joint-graph form
            shared0, rest0 = _split_shared(params)

            def loss_all(shared, rest):
                p = {**shared, **rest}
                out = forward(p, batch, rng)
                heads = jnp.mean(out.aux["ctc_per_head"], axis=1)  # [K]
                return (out.loss, heads), out.aux

            (loss, heads), vjp_fn, aux = jax.vjp(
                loss_all, shared0, rest0, has_aux=True)
            K = heads.shape[0]
            g_shared_total, g_rest = vjp_fn((jnp.float32(1.0), jnp.zeros_like(heads)))
            # NOTE: no 1/accum_steps seed scaling here. The reference scales
            # per-head grads by 1/accum (trainer_seq2seq.py:1096-1106) because
            # HF SUMS micro-batch grads; our optax.MultiSteps AVERAGES them,
            # so an extra 1/accum would shrink encoder+separator grads by an
            # additional factor of accum vs every other subtree.
            head_grads = []
            for i in range(K):
                e = jnp.zeros_like(heads).at[i].set(1.0)
                g_i, _ = vjp_fn((jnp.float32(0.0), e))
                if trainable_mask is not None:
                    m_shared, _ = _split_shared(trainable_mask)
                    g_i = _mask_tree(g_i, m_shared)
                head_grads.append(g_i)
            g_shared_proj = pcgrad_project(head_grads)
        else:
            # Three-stage linearization (SURVEY hard-part #5):
            #   A: encoder + separator   (SHARED params only)
            #   B: refiner/bridge        (rest params, cheap)
            #   post: decoder + losses   (rest params)
            # PCGrad DISCARDS the total loss's shared-subtree gradient
            # (the reference overwrite, trainer_seq2seq.py:1140-1144), so
            # the total-loss pullback stops at stage B — vjp_a is only
            # ever invoked with the K head cotangents, i.e. K encoder
            # backwards instead of the reference's K+1 full-graph
            # autograd.grad calls (trainer_seq2seq.py:1106-1113).
            shared0, rest0 = _split_shared(params)

            def stage_a(shared):
                p = {**shared, **rest0}
                return encode_feats(
                    p, cfg, batch["input_values"], batch.get("audio_mask"),
                    mask_time_indices=batch.get("mask_time_indices"),
                    deterministic=False, rng=rng)

            feats, vjp_a = jax.vjp(stage_a, shared0)

            def stage_b(f, rest):
                p = {**shared0, **rest}
                return bridge_features(p, cfg, f)

            enc, vjp_b = jax.vjp(stage_b, feats, rest0)

            def post(enc_in, rest):
                p = {**shared0, **rest}
                out = model_forward_from_enc(
                    p, cfg, enc_in, batch["decoder_input_ids"],
                    splice_index=splice_index,
                    ce_labels=batch.get("ce_labels"),
                    label_spks=batch.get("label_spks"),
                    label_spk_lens=batch.get("label_spk_lens"),
                    rng=rng, use_pit=False)
                heads = jnp.mean(out.aux["ctc_per_head"], axis=1)  # [K]
                return (out.loss, heads), out.aux

            (loss, heads), vjp_post, aux = jax.vjp(
                post, enc, rest0, has_aux=True)
            K = heads.shape[0]
            cot_enc, g_rest_post = vjp_post(
                (jnp.float32(1.0), jnp.zeros_like(heads)))
            # total-loss pullback through the cheap bridge only; its
            # feats cotangent (-> shared grads) is the part PCGrad drops
            _, g_rest_b = vjp_b(cot_enc)
            # rest params can feed BOTH stages (CTC heads also serve the
            # softmax bridge / refiner inside stage B)
            g_rest = _tree_add(g_rest_post, g_rest_b)

            # head-only loss: per-head CTC means as a function of the
            # (refined) sep_hidden (CTC head params from rest0 are
            # constants — per-head grads only ever feed the projection on
            # the SHARED subtree). Recomputes the cheap CTC lattice; the
            # accum-scaling NOTE from the PIT branch applies here too.
            hlens = (jnp.sum(enc.mask_x0.astype(jnp.int32), axis=1)
                     if enc.mask_x0 is not None else None)
            ctc_params = _ctc_head_list({**shared0, **rest0}, cfg)

            def head_loss(sep_hidden):
                _, per_head = serialized_ctc_loss(
                    ctc_params, sep_hidden, hlens,
                    batch["label_spks"], batch["label_spk_lens"],
                    cfg.ctc_blank_id)
                return jnp.mean(per_head, axis=1)                  # [K]

            _, vjp_head = jax.vjp(head_loss, enc.sep_hidden)
            # zero cotangent with vjp-correct dtypes (bool/int leaves are
            # float0 in cot_enc; reuse them as-is)

            def _zf(x):
                return (x if x.dtype == jax.dtypes.float0
                        else jnp.zeros_like(x))
            zero_cot = jax.tree_util.tree_map(_zf, cot_enc)
            head_grads = []
            for i in range(K):
                e = jnp.zeros_like(heads).at[i].set(1.0)
                (cot_sep,) = vjp_head(e)
                cot_i = dataclasses.replace(zero_cot, sep_hidden=cot_sep)
                cot_feats_i, _ = vjp_b(cot_i)
                (g_i,) = vjp_a(cot_feats_i)
                if trainable_mask is not None:
                    m_shared, _ = _split_shared(trainable_mask)
                    g_i = _mask_tree(g_i, m_shared)
                head_grads.append(g_i)
            g_shared_proj = pcgrad_project(head_grads)

        if use_pcgrad:
            grads = {**g_shared_proj, **g_rest}
            # per-head grad-norm diagnostics on the shared params (the
            # reference's per_head_grad_stats, trainer_seq2seq.py:228-372)
            aux = dict(aux)
            aux["ctc_head_grad_norms"] = jnp.stack(
                [optax.global_norm(g) for g in head_grads])

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        gnorm = optax.global_norm(
            _mask_tree(grads, trainable_mask) if trainable_mask is not None
            else grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        for k in ("loss_attn", "loss_ctc", "ctc_head_grad_norms",
                  "pit_swap_ratio"):
            if k in aux:
                metrics[k] = aux[k]
        return params, opt_state, metrics

    donate_args = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_eval_step(cfg: SpeechEncoderDecoderConfig, *,
                   splice_index: int = 1) -> Callable:
    def eval_step(params, batch):
        out = model_forward(
            params, cfg,
            batch["input_values"], batch.get("audio_mask"),
            batch["decoder_input_ids"], splice_index=splice_index,
            ce_labels=batch.get("ce_labels"),
            label_spks=batch.get("label_spks"),
            label_spk_lens=batch.get("label_spk_lens"),
            deterministic=True)
        metrics = {"loss": out.loss}
        for k in ("loss_attn", "loss_ctc"):
            if k in out.aux:
                metrics[k] = out.aux[k]
        return metrics
    return jax.jit(eval_step)
