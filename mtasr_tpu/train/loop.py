"""High-level training loop: epochs, logging, eval (loss + WER-with-generate),
checkpoint/resume, speed metrics.

Replaces the reference's vendored HF Seq2SeqTrainer
(/root/reference/src/trainer_seq2seq.py): _inner_training_loop (1149),
evaluate->prediction_step with generation (457, 625-734), speed_metrics
(540-547), save/best-model retention (1663-1704). PCGrad lives inside the
jitted train step (train_step.py), not the loop.
"""
from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mtasr_tpu.config import (
    DataConfig, GenerationConfig, SpeechEncoderDecoderConfig, TrainingConfig,
)
from mtasr_tpu.data.pipeline import Batch, batches_from_examples
from mtasr_tpu.generate import generate
from mtasr_tpu.train.checkpoint import (
    last_checkpoint, restore_checkpoint, save_checkpoint,
)
from mtasr_tpu.train.freeze import freeze_summary, trainable_mask
from mtasr_tpu.train.optimizer import make_optimizer
from mtasr_tpu.train.train_step import make_eval_step, make_train_step
from mtasr_tpu.utils.wer import Calculator

logger = logging.getLogger("mtasr_tpu.trainer")


@dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0
    # data-stream position (HF skip_first_batches semantics,
    # trainer_seq2seq.py:1475-1502): a resumed run reproduces the exact
    # straight-through batch order, not just the parameter state
    epoch: int = 0
    batch_in_epoch: int = 0


class Trainer:
    """Minimal-but-complete trainer. Batches come from data/pipeline.py;
    each (audio_bucket, label_len) shape pair compiles once."""

    def __init__(self, cfg: SpeechEncoderDecoderConfig, tc: TrainingConfig,
                 dc: DataConfig, params: dict,
                 tokenizer=None,
                 freeze_kwargs: Optional[dict] = None,
                 gen_cfg: Optional[GenerationConfig] = None,
                 mesh=None,
                 total_steps: Optional[int] = None):
        """mesh: optional jax.sharding.Mesh ('data','model'). When given,
        params are sharded by the TP partition rules and every batch is
        sharded over the data axis — the DDP(+TP) equivalent of the
        reference's torch.distributed.launch training (run.sh:193-194).

        total_steps: schedule horizon for epoch mode (max_steps<=0);
        typically steps_per_epoch * num_train_epochs, like HF's
        num_update_steps_per_epoch bookkeeping."""
        self.cfg = cfg
        self.tc = tc
        self.dc = dc
        self.tokenizer = tokenizer
        self.gen_cfg = gen_cfg or GenerationConfig()
        self.mesh = mesh
        self.mask = trainable_mask(params, train_mode=cfg.train_mode,
                                   **(freeze_kwargs or {}))
        summ = freeze_summary(params, self.mask)
        logger.info("params: total=%d trainable=%d frozen=%d", summ["total"],
                    summ["trainable"], summ["frozen"])
        sched_total = tc.max_steps if tc.max_steps > 0 else total_steps
        self.optimizer = make_optimizer(tc, self.mask,
                                        total_steps=sched_total)
        if mesh is not None:
            from mtasr_tpu.parallel.mesh import shard_params
            params = shard_params(params, mesh)
            logger.info("sharded params over mesh %s", dict(mesh.shape))
            # the Pallas kernels need their SPMD partitioning rules under
            # a mesh (ops/pallas/spmd.py) — a bare pallas_call is a Mosaic
            # custom call the partitioner would otherwise gather for:
            # flash fwd+bwd inside the train step, the decode kernel in
            # eval generate
            import jax as _jax
            if (cfg.encoder.attention_impl == "flash"
                    or (cfg.encoder.attention_impl == "auto"
                        and _jax.default_backend() != "cpu")):
                cfg.encoder.attention_impl = "flash_spmd"
            if cfg.decoder.decode_attn_impl == "pallas":
                cfg.decoder.decode_attn_impl = "pallas_spmd"
        # opt state inherits param shardings (zeros_like under jit keeps
        # the NamedShardings of its prototypes)
        self.state = TrainState(params=params,
                                opt_state=self.optimizer.init(params))
        self._train_steps: Dict[int, Callable] = {}
        self._eval_steps: Dict[int, Callable] = {}
        self.metrics_log: List[dict] = []
        self.best_metric: Optional[float] = None
        self.best_step: Optional[int] = None

    # -- step caches keyed by splice_index (static per batch layout) --------
    def _train_step(self, splice_index: int) -> Callable:
        if splice_index not in self._train_steps:
            self._train_steps[splice_index] = make_train_step(
                self.cfg, self.tc, self.optimizer, splice_index=splice_index,
                trainable_mask=self.mask, donate=True)
        return self._train_steps[splice_index]

    def _eval_step(self, splice_index: int) -> Callable:
        if splice_index not in self._eval_steps:
            self._eval_steps[splice_index] = make_eval_step(
                self.cfg, splice_index=splice_index)
        return self._eval_steps[splice_index]

    def _write_metrics(self, m: dict) -> None:
        """Append-only JSONL metrics stream (the tensorboard/wandb
        equivalent surface; reference reports via HF Trainer callbacks)."""
        import json
        import os
        try:
            os.makedirs(self.tc.output_dir, exist_ok=True)
            with open(os.path.join(self.tc.output_dir, "metrics.jsonl"),
                      "a") as f:
                f.write(json.dumps(m) + "\n")
        except OSError:
            pass

    # -- checkpointing ------------------------------------------------------
    def save(self, output_dir: Optional[str] = None) -> str:
        out = output_dir or self.tc.output_dir
        return save_checkpoint(
            out, self.state.step, self.state.params, self.state.opt_state,
            extra={"step": np.asarray(self.state.step),
                   "epoch": np.asarray(self.state.epoch),
                   "batch_in_epoch": np.asarray(self.state.batch_in_epoch)},
            save_total_limit=self.tc.save_total_limit)

    def maybe_resume(self) -> bool:
        ckpt = last_checkpoint(self.tc.output_dir)
        if ckpt is None:
            return False
        template = {
            "params": jax.tree_util.tree_map(np.asarray, self.state.params),
            "opt_state": jax.tree_util.tree_map(np.asarray,
                                                self.state.opt_state),
            "extra": {"step": np.asarray(0), "epoch": np.asarray(0),
                      "batch_in_epoch": np.asarray(0)},
        }
        restored = restore_checkpoint(ckpt, template)
        self.state = TrainState(
            params=self._commit(restored["params"]),
            opt_state=self._commit(restored["opt_state"]),
            step=int(restored["extra"]["step"]),
            epoch=int(restored["extra"].get("epoch", 0)),
            batch_in_epoch=int(restored["extra"].get("batch_in_epoch", 0)))
        logger.info("resumed from %s at step %d (epoch %d, batch %d)",
                    ckpt, self.state.step, self.state.epoch,
                    self.state.batch_in_epoch)
        return True

    def _commit(self, tree):
        """Device-commit a restored tree, re-applying mesh shardings —
        plain jnp.asarray would replicate on the default device and
        silently drop TP sharding after resume/best-load (ADVICE r2)."""
        if self.mesh is not None:
            from mtasr_tpu.parallel.mesh import shard_params
            return shard_params(tree, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, tree)

    # -- train --------------------------------------------------------------
    def train(self, train_batches: Callable[[], Iterable[Batch]],
              eval_batches: Optional[Callable[[], Iterable[Batch]]] = None,
              eval_refs: Optional[Dict[str, str]] = None,
              max_steps: Optional[int] = None) -> TrainState:
        max_steps = max_steps or self.tc.max_steps
        if max_steps <= 0:
            # epoch mode (run.sh passes num_train_epochs, max_steps unset):
            # the epoch-count break below bounds the run
            max_steps = int(1e12)
        base_rng = jax.random.key(self.tc.seed)
        t_start = time.perf_counter()
        samples = 0
        # data-stream-exact resume: restart inside the interrupted epoch and
        # skip the batches that epoch already consumed (HF skip_first_batches,
        # trainer_seq2seq.py:1475-1502). train_batches may accept an `epoch`
        # argument so the per-epoch shuffle is a function of the epoch (not
        # of the resume step), making the stream identical to an
        # uninterrupted run.
        import inspect
        try:
            takes_epoch = len(
                inspect.signature(train_batches).parameters) >= 1
        except (TypeError, ValueError):
            takes_epoch = False
        skip = self.state.batch_in_epoch
        # a mid-epoch resume re-enters the interrupted epoch; a clean
        # epoch boundary starts the next one
        epoch = self.state.epoch - 1 if skip > 0 else self.state.epoch
        while self.state.step < max_steps:
            epoch += 1
            n_batches = 0
            completed_epoch = True
            it = train_batches(epoch) if takes_epoch else train_batches()
            for bi, batch in enumerate(it):
                n_batches += 1
                if bi < skip:
                    continue          # consumed before the resume point
                if self.state.step >= max_steps:
                    completed_epoch = False   # stopped mid-epoch
                    break
                # rng is a pure function of (seed, step): resuming from a
                # checkpoint reproduces the exact dropout stream (the
                # reference reloads RNG state on resume for the same
                # guarantee, trainer_seq2seq.py:1475-1485)
                step_rng = jax.random.fold_in(base_rng, self.state.step)
                arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()
                          if k != "prompt_ids"}
                if self.mesh is not None:
                    from mtasr_tpu.parallel.mesh import shard_batch
                    arrays = shard_batch(arrays, self.mesh)
                step_fn = self._train_step(batch.splice_index)
                params, opt_state, metrics = step_fn(
                    self.state.params, self.state.opt_state, arrays, step_rng)
                self.state = TrainState(params, opt_state,
                                        self.state.step + 1,
                                        epoch=epoch, batch_in_epoch=bi + 1)
                samples += batch.arrays["input_values"].shape[0]
                if self.state.step % self.tc.logging_steps == 0:
                    m = {k: (np.asarray(v).tolist() if np.ndim(v) else float(v))
                         for k, v in metrics.items()}
                    dt = time.perf_counter() - t_start
                    m.update(step=self.state.step, epoch=epoch,
                             samples_per_second=round(samples / dt, 2),
                             steps_per_second=round(self.state.step / dt, 3))
                    self.metrics_log.append(m)
                    self._write_metrics(m)
                    logger.info("step %d: %s", self.state.step, m)
                if self.state.step % self.tc.save_steps == 0:
                    self.save()
                if (eval_batches is not None
                        and self.state.step % self.tc.eval_steps == 0):
                    em = self.evaluate(eval_batches(), eval_refs)
                    logger.info("eval @%d: %s", self.state.step, em)
                    self._maybe_update_best(em)
            skip = 0
            if completed_epoch:
                # epoch boundary: next resume starts the following epoch
                self.state = TrainState(self.state.params,
                                        self.state.opt_state,
                                        self.state.step, epoch=epoch,
                                        batch_in_epoch=0)
            if n_batches == 0:
                logger.warning("no batches produced this epoch; stopping")
                break
            if epoch >= self.tc.num_train_epochs and self.tc.max_steps <= 0:
                break
        self.save()
        self._maybe_load_best()
        # drain any in-flight async checkpoint write before handing back
        # control (a process exit with a pending write would truncate it)
        from mtasr_tpu.train.checkpoint import wait_for_pending_saves
        wait_for_pending_saves()
        return self.state

    # -- best-model retention (trainer_seq2seq.py:1663-1704; run.sh:202-204:
    # metric_for_best_model=eval_loss, greater_is_better=false) -------------
    def _best_dir(self) -> str:
        import os
        return os.path.join(self.tc.output_dir, "best")

    def _maybe_update_best(self, eval_metrics: Dict[str, float]) -> None:
        key = self.tc.metric_for_best_model
        if key not in eval_metrics and not key.startswith("eval_"):
            key = f"eval_{key}"          # HF's metric-name normalization
        if key not in eval_metrics:
            return
        value = float(eval_metrics[key])
        better = (self.best_metric is None
                  or (value > self.best_metric if self.tc.greater_is_better
                      else value < self.best_metric))
        if not better:
            return
        self.best_metric = value
        self.best_step = self.state.step
        # saved outside the checkpoint-N rotation so save_total_limit can
        # never evict the best model (HF protects best_model_checkpoint too)
        save_checkpoint(self._best_dir(), self.state.step, self.state.params,
                        extra={"step": np.asarray(self.state.step),
                               "metric": np.asarray(value)},
                        save_total_limit=1)
        logger.info("new best %s=%.4f at step %d", key, value,
                    self.state.step)

    def _maybe_load_best(self) -> None:
        if not self.tc.load_best_model_at_end or self.best_step is None:
            return
        ckpt = last_checkpoint(self._best_dir())
        if ckpt is None:
            return
        template = {
            "params": jax.tree_util.tree_map(np.asarray, self.state.params),
            "extra": {"step": np.asarray(0), "metric": np.asarray(0.0)},
        }
        restored = restore_checkpoint(ckpt, template)
        # NOTE: opt_state intentionally stays at last-step values (the best
        # checkpoint stores params only, mirroring HF's best-model reload
        # into a live trainer, trainer_seq2seq.py:1667-1704). Continuing
        # training from this state pairs best params with last-step
        # optimizer moments — save() a fresh checkpoint first if you intend
        # to resume from "best".
        self.state = TrainState(
            params=self._commit(restored["params"]),
            opt_state=self.state.opt_state, step=self.state.step)
        logger.info("loaded best model (step %d, %s=%.4f)", self.best_step,
                    self.tc.metric_for_best_model, self.best_metric)

    # -- eval ---------------------------------------------------------------
    def evaluate(self, batches: Iterable[Batch],
                 refs: Optional[Dict[str, str]] = None,
                 with_generate: bool = True) -> Dict[str, float]:
        losses = []
        calc = Calculator() if (refs and self.tokenizer) else None
        for batch in batches:
            arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()
                      if k != "prompt_ids"}
            if self.mesh is not None:
                # evaluate under the same dp x tp layout as training
                # (reference evaluates under its training DDP,
                # trainer_seq2seq.py:457-734); without this, eval at 8B
                # scale silently replicates and can OOM (VERDICT r2)
                from mtasr_tpu.parallel.mesh import shard_batch
                arrays = shard_batch(arrays, self.mesh)
            m = self._eval_step(batch.splice_index)(self.state.params, arrays)
            losses.append(float(m["loss"]))
            if calc is not None and with_generate:
                prompt = (jnp.asarray(batch.arrays["prompt_ids"])
                          if "prompt_ids" in batch.arrays else None)
                if self.mesh is not None and prompt is not None:
                    from mtasr_tpu.parallel.mesh import shard_batch
                    prompt = shard_batch({"prompt_ids": prompt},
                                         self.mesh)["prompt_ids"]
                out = generate(self.state.params, self.cfg,
                               arrays["input_values"],
                               arrays.get("audio_mask"), prompt_ids=prompt,
                               gen=self.gen_cfg)
                seqs = np.asarray(out.sequences)
                from mtasr_tpu.utils.wer import clean_decoded_text
                for i, utt_id in enumerate(batch.utt_ids):
                    hyp = clean_decoded_text(self.tokenizer.decode(
                        seqs[i], skip_special_tokens=False))
                    calc.calculate(utt_id, clean_decoded_text(
                        refs.get(utt_id, "")), hyp)
        out_metrics = {"eval_loss": float(np.mean(losses)) if losses else 0.0}
        if calc is not None:
            out_metrics["eval_wer"] = calc.overall().wer
        return out_metrics
