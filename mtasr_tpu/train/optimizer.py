"""Optimizer: AdamW + linear warmup-decay + global-norm clipping + freeze
masking — matches the reference's HF Trainer defaults (run.sh:209-218:
lr 3e-5, warmup 400, max_grad_norm 1.0; HF 'linear' scheduler)."""
from __future__ import annotations

from typing import Optional

import optax

from mtasr_tpu.config import TrainingConfig


def linear_warmup_schedule(lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """HF get_linear_schedule_with_warmup semantics."""
    def schedule(step):
        warm = lr * (step + 1) / max(1, warmup_steps)
        decay = lr * (total_steps - step) / max(1, total_steps - warmup_steps)
        import jax.numpy as jnp
        return jnp.where(step < warmup_steps, warm, jnp.maximum(decay, 0.0))
    return schedule


def make_optimizer(tc: TrainingConfig, trainable: Optional[dict] = None,
                   total_steps: Optional[int] = None
                   ) -> optax.GradientTransformation:
    total = total_steps or tc.max_steps
    if total is None or total <= 0:
        raise ValueError(
            "linear schedule needs a positive total step count: set "
            "TrainingConfig.max_steps > 0, or (epoch mode) pass total_steps="
            "steps_per_epoch * num_train_epochs")
    sched = linear_warmup_schedule(tc.learning_rate, tc.warmup_steps, total)
    tx = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(sched, b1=tc.adam_beta1, b2=tc.adam_beta2,
                    eps=tc.adam_epsilon, weight_decay=tc.weight_decay),
    )
    if trainable is not None:
        import jax
        frozen = jax.tree_util.tree_map(lambda b: not b, trainable)
        # optax.masked passes NON-masked updates through UNCHANGED (i.e. the
        # raw gradient would be applied to frozen params) — explicitly zero
        # them with a second mask.
        tx = optax.chain(
            optax.masked(tx, trainable),
            optax.masked(optax.set_to_zero(), frozen),
        )
    if tc.gradient_accumulation_steps > 1:
        # HF Trainer-style micro-batch accumulation: updates apply every
        # k-th step, intermediate steps return zero updates
        tx = optax.MultiSteps(tx, tc.gradient_accumulation_steps)
    return tx
