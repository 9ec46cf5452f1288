"""Optimizer: AdamW + linear warmup-decay + global-norm clipping + freeze
masking — matches the reference's HF Trainer semantics exactly
(run.sh:209-218: lr 3e-5, warmup 400, max_grad_norm 1.0; HF 'linear'
scheduler; HF Trainer.create_optimizer decay parameter-grouping).

Two semantics that the obvious optax spelling gets WRONG and that are
pinned by the trainer A/B (tests/test_reference_ab.py):

* **Schedule indexing.** HF's `get_linear_schedule_with_warmup` is a
  LambdaLR: optimizer step t (0-indexed) runs at factor `lambda(t)`, so
  with warmup>0 the FIRST optimizer step runs at lr == 0 (lambda(0) =
  0/warmup). The moments still advance on that step. We reproduce that
  exactly — optax's schedule `count` is the number of prior updates,
  which equals HF's scheduler epoch counter.
* **Decay parameter grouping.** HF `Trainer.create_optimizer` puts biases
  and every normalization parameter (nn.LayerNorm instances + any name
  matching bias/layernorm/rmsnorm/norm/_norm) in a weight_decay=0.0
  group. `optax.adamw` decays everything by default — we pass the
  equivalent path mask.
"""
from __future__ import annotations

from typing import Optional

import optax

from mtasr_tpu.config import TrainingConfig


def linear_warmup_schedule(lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """HF get_linear_schedule_with_warmup semantics, including the lr==0
    first step under warmup (LambdaLR evaluates lambda(0) for the first
    optimizer step; transformers/optimization.py get_linear_schedule)."""
    def schedule(step):
        import jax.numpy as jnp
        warm = lr * step / max(1, warmup_steps)
        decay = lr * (total_steps - step) / max(1, total_steps - warmup_steps)
        return jnp.where(step < warmup_steps, warm,
                         jnp.maximum(decay, 0.0))
    return schedule


def _is_no_decay(path_keys) -> bool:
    """Our param-tree spelling of HF's forbidden_name_patterns
    (transformers Trainer.get_decay_parameter_names: bias, layernorm,
    rmsnorm, (^|.)norm($|.), _norm, plus nn.LayerNorm instances). Our
    normalization modules are named *norm*, ln, ln_*, *_ln (separator
    branches / refiners)."""
    for k in path_keys:
        if k == "bias" or "norm" in k:
            return True
        if k == "ln" or k.startswith("ln_") or k.endswith("_ln"):
            return True
    return False


def hf_decay_mask(params):
    """Pytree of bools: True where HF's AdamW would apply weight decay."""
    import jax

    def f(path, _leaf):
        keys = [str(p.key) for p in path if hasattr(p, "key")]
        return not _is_no_decay(keys)
    return jax.tree_util.tree_map_with_path(f, params)


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
                    eps=tc.adam_epsilon, weight_decay=tc.weight_decay,
                    mask=hf_decay_mask),
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
