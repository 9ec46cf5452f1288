"""Training entry point (reference: /root/reference/finetune_asr.py:47-225).

Stages: resume-or-raise, dataset load, model load (+ optional partial
separator/CTC restore), freeze + optional LoRA insert, preprocess, train,
save (+ LoRA merge).
"""
from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from mtasr_tpu.cli.args import (
    add_data_args, add_generation_args, add_model_args, add_training_args, csv,
)
from mtasr_tpu.config import DataConfig, GenerationConfig, TrainingConfig
from mtasr_tpu.data.audio import build_file_paths, load_kaldi_dir
from mtasr_tpu.data.pipeline import batches_from_examples, prepare_example
from mtasr_tpu.data.tokenizer import CharTokenizer, HFTokenizer
from mtasr_tpu.train.checkpoint import load_partial, resume_or_raise
from mtasr_tpu.train.loop import Trainer
from mtasr_tpu.utils.model_io import load_model, save_model

logger = logging.getLogger("mtasr_tpu.finetune")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("finetune_asr")
    add_model_args(p)
    add_data_args(p)
    add_training_args(p)
    add_generation_args(p)
    p.add_argument("--tokenizer_name", type=str, default=None)
    return p


def main(argv=None):
    import json
    import sys
    argv = argv if argv is not None else sys.argv[1:]
    # single-JSON-file invocation (reference finetune_asr.py:51-56 accepts
    # one .json file of flag values)
    if len(argv) == 1 and argv[0].endswith(".json"):
        with open(argv[0]) as f:
            flags = json.load(f)
        argv = []
        for k, v in flags.items():
            if isinstance(v, bool):
                if v:
                    argv.append(f"--{k}")
            else:
                argv += [f"--{k}", str(v)]
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    resume_or_raise(args.output_dir, overwrite=args.overwrite_output_dir)

    cfg, params = load_model(args.model_name_or_path)
    # flag overrides onto config (reference finetune_asr.py:91-108)
    for name in ("talker_ctc", "talker_ctc_refine", "talker_numbers",
                 "separator_hidden", "ctc_bridge", "ctc_bridge_type",
                 "train_mode", "ctc_alpha", "decoder_cross_attention",
                 "decoder_cross_attention_type",
                 "decoder_cross_attention_feature", "r_max", "lora_alpha",
                 "instruct"):
        if hasattr(args, name) and getattr(args, name) is not None:
            setattr(cfg, name, getattr(args, name))
    cfg.encoder.attention_impl = args.attention_impl
    if args.gradient_checkpointing:
        cfg.encoder.remat = True
        cfg.decoder.remat = True

    if args.pretrain_separator_path:
        _, donor = load_model(args.pretrain_separator_path)
        params = load_partial(params, donor, ("separator", "serialized_ctc"))

    if args.use_lora:
        from mtasr_tpu.train.lora import init_decoder_lora
        params["decoder_lora"] = init_decoder_lora(
            jax.random.key(0), params["decoder"], r=16, alpha=32.0)
        cfg.lora_dropout = args.lora_dropout

    if args.tokenizer_name:
        tokenizer = HFTokenizer(args.tokenizer_name)
    else:
        import os as _os
        saved = _os.path.join(args.model_name_or_path, "char_tokenizer.json")
        if _os.path.exists(saved):
            tokenizer = CharTokenizer.load(saved)
        else:
            tokenizer = CharTokenizer()
            sp = tokenizer.add_special_tokens(instruct=cfg.instruct)
            cfg.pad_token_id, cfg.sc_token_id = sp.pad_token_id, sp.sc_token_id

    dc = DataConfig(max_duration_in_seconds=args.max_duration_in_seconds,
                    min_duration_in_seconds=args.min_duration_in_seconds,
                    do_lower_case=args.do_lower_case)
    tc = TrainingConfig(
        output_dir=args.output_dir, learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps, max_steps=args.max_steps,
        num_train_epochs=args.num_train_epochs,
        per_device_train_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        max_grad_norm=args.max_grad_norm, logging_steps=args.logging_steps,
        eval_steps=args.eval_steps, save_steps=args.save_steps,
        save_total_limit=args.save_total_limit, seed=args.seed,
        bf16=args.bf16, pcgrad=args.pcgrad)

    if args.dataset_name is not None:
        splits = build_file_paths(args.data_dir or ".", args.dataset_name)
    elif os.path.exists(os.path.join(args.data_dir, "wav.scp")):
        # flat Kaldi dir: reuse it for all splits (the `_mini` pattern,
        # generate_dataset.py:109-119)
        splits = {"train": args.data_dir, "validation": args.data_dir,
                  "test": args.data_dir}
    else:
        splits = {"train": os.path.join(args.data_dir, "train"),
                  "validation": os.path.join(args.data_dir, "dev"),
                  "test": os.path.join(args.data_dir, "test")}
    train_utts = load_kaldi_dir(splits["train"], prompt=args.prompt)
    eval_utts = load_kaldi_dir(splits["validation"], prompt=args.prompt)
    if args.max_train_samples:
        train_utts = train_utts[: args.max_train_samples]
    if args.max_eval_samples:
        eval_utts = eval_utts[: args.max_eval_samples]

    from mtasr_tpu.data.pipeline import prepare_examples
    lazy = not args.eager_audio
    train_ex = prepare_examples(
        train_utts, tokenizer, dc, cfg.instruct, lazy=lazy,
        num_proc=args.preprocessing_num_workers,
        cache_path=args.preprocessing_cache)
    eval_ex = prepare_examples(
        eval_utts, tokenizer, dc, cfg.instruct, lazy=lazy,
        num_proc=args.preprocessing_num_workers)
    logger.info("examples: train=%d eval=%d (lazy=%s)", len(train_ex),
                len(eval_ex), lazy)

    freeze_kwargs = dict(
        freeze_feature_encoder=args.freeze_feature_encoder,
        freeze_encoder=args.freeze_encoder,
        freeze_decoder=args.freeze_decoder,
        partial_encoder_unfreeze=csv(args.partial_encoder_unfreeze),
        partial_decoder_unfreeze=csv(args.partial_decoder_unfreeze),
        partial_others_unfreeze=csv(args.partial_others_unfreeze))

    # mesh-parallel training (the reference's torch.distributed.launch DDP,
    # run.sh:193-194, plus real TP): dp x tp over all visible devices
    from mtasr_tpu.parallel import multihost
    from mtasr_tpu.parallel.mesh import make_mesh
    multihost.initialize()
    tp = max(1, args.tp_size)
    dp = args.dp_size if args.dp_size > 0 else jax.device_count() // tp
    dp = max(1, dp)
    mesh = make_mesh(dp_size=dp, tp_size=tp) if dp * tp > 1 else None
    tc.dp_size, tc.tp_size = dp, tp
    global_batch = tc.per_device_train_batch_size * dp

    steps_per_epoch = max(1, (len(train_ex) + global_batch - 1) // global_batch)
    total_steps = (tc.max_steps if tc.max_steps > 0
                   else int(steps_per_epoch * tc.num_train_epochs))

    trainer = Trainer(cfg, tc, dc, params, tokenizer=tokenizer,
                      freeze_kwargs=freeze_kwargs,
                      gen_cfg=GenerationConfig(max_length=args.max_length),
                      mesh=mesh, total_steps=total_steps)
    trainer.maybe_resume()

    eval_refs = {u.utt_id: (u.text.lower() if dc.do_lower_case else u.text)
                 for u in eval_utts}

    def train_iter(epoch: int = 0):
        # per-epoch reshuffle seeded by (seed, epoch) — NOT by resume step,
        # so a mid-epoch resume replays the identical shuffle and the
        # Trainer's batch skipping reproduces the uninterrupted data order
        # (HF set_epoch + skip_first_batches semantics)
        return batches_from_examples(
            train_ex, cfg, dc, global_batch, training=True,
            pad_partial=True,   # DDP sampler padding: small datasets still
            seed=tc.seed + epoch)           # fill a dp-wide batch

    def eval_iter():
        return batches_from_examples(
            eval_ex, cfg, dc, args.per_device_eval_batch_size * dp,
            training=False, shuffle=False, drop_last=False)

    trainer.train(train_iter, eval_iter if eval_ex else None, eval_refs)

    # final save (+ LoRA merge, reference finetune_asr.py:196-221 + run.sh:252)
    final = trainer.state.params
    if "decoder_lora" in final:
        save_model(os.path.join(args.output_dir, "model_unmerge"), cfg, final)
        from mtasr_tpu.train.lora import merge_decoder_lora
        final = merge_decoder_lora(final)
    final_dir = os.path.join(args.output_dir, "final")
    save_model(final_dir, cfg, final)
    if isinstance(tokenizer, CharTokenizer):
        tokenizer.save(os.path.join(final_dir, "char_tokenizer.json"))
    logger.info("saved final model to %s", final_dir)


if __name__ == "__main__":
    main()
