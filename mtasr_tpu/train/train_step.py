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

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mtasr_tpu.config import SpeechEncoderDecoderConfig, TrainingConfig
from mtasr_tpu.models.speech_encoder_decoder import model_forward

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
        else:
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
