"""Batched inference entry point (reference: inference_asr.py:49-221 and the
multi-GPU variant inference_asr_gpus.py:70-283).

Differences from the reference, driven by TPU batching:
* decodes in static-shape batches instead of a per-sample Python loop
* multi-host sharding via --shard_index/--num_shards (the reference's
  dataset.shard + rank files + barrier + rank-0 merge, lines 200-277, maps
  to one process per host writing 'decod.{i}' files merged by merge mode)

Outputs 'label' and 'decod' files (utt_id + text) and a .wer report scored
with compute-wer semantics (run.sh:316-325).
"""
from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from mtasr_tpu.cli.args import add_data_args, add_generation_args, add_model_args
from mtasr_tpu.config import DataConfig, GenerationConfig
from mtasr_tpu.data.audio import load_kaldi_dir
from mtasr_tpu.data.pipeline import batches_from_examples, prepare_example
from mtasr_tpu.data.tokenizer import CharTokenizer, HFTokenizer
from mtasr_tpu.generate import generate, generate_ctc
from mtasr_tpu.utils.model_io import load_model
from mtasr_tpu.utils.wer import Calculator

logger = logging.getLogger("mtasr_tpu.inference")


def build_argparser():
    p = argparse.ArgumentParser("inference_asr")
    add_model_args(p)
    add_data_args(p)
    add_generation_args(p)
    p.add_argument("--tokenizer_name", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--dp_size", type=int, default=-1,
                   help="data-parallel mesh axis (-1: all devices / tp)")
    p.add_argument("--tp_size", type=int, default=1,
                   help="tensor-parallel mesh axis (8B needs >1 per chip)")
    p.add_argument("--merge", action="store_true",
                   help="merge per-shard decod files and score")
    p.add_argument("--char_mode", action="store_true")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "w8", "w8a8"],
                   help="decoder weight quantization for serving (w8a8 = "
                        "true int8 MXU matmuls)")
    p.add_argument("--kv_quant", action="store_true",
                   help="int8 KV cache (per-token-per-head scales); halves "
                        "the dominant HBM stream of long-context decode")
    p.add_argument("--encode_chunk", type=int, default=None,
                   help="encode the batch in chunks of this many rows "
                        "(bounds the conv frontend's peak HBM so the "
                        "decode batch can exceed what single-pass encode "
                        "allows)")
    p.add_argument("--speculative", type=str, default=None,
                   choices=["ctc"],
                   help="speculative greedy decoding drafted by the model's "
                        "own per-speaker CTC heads; output is token-"
                        "identical to plain greedy, only faster (needs "
                        "talker_ctc)")
    p.add_argument("--spec_k", type=int, default=4,
                   help="draft tokens verified per speculative step")
    p.add_argument("--pipelined", action="store_true",
                   help="decode same-shape batch runs through the fused "
                        "stream engine (generate/pipelined.py): encode of "
                        "batch i+1 is compiled into the decode loop of "
                        "batch i, so a whole run executes as one program "
                        "per batch with no per-step dispatch. Token-"
                        "identical to sequential decode; measured NEUTRAL "
                        "on throughput at production batch sizes on a "
                        "local chip (DESIGN.md round 4) — its value is "
                        "fewer dispatches on high-latency runtimes")
    p.add_argument("--quantize_scope", type=str, default="decoder",
                   choices=["decoder", "all"],
                   help="'decoder' quantizes the weight-bound decode loop; "
                        "'all' also quantizes the encoder transformer "
                        "(compute-bound: w8a8 rides the MXU's 2x int8 "
                        "throughput)")
    return p


def merge_and_score(args) -> str:
    """Rank-0 merge (inference_asr_gpus.py:263-277) + WER report."""
    labels, decods = {}, {}
    for i in range(args.num_shards):
        for name, store in (("label", labels), ("decod", decods)):
            path = os.path.join(args.output_dir, f"{name}.{i}")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                for line in f:
                    parts = line.rstrip("\n").split(None, 1)
                    store[parts[0]] = parts[1] if len(parts) > 1 else ""
    with open(os.path.join(args.output_dir, "label"), "w") as f:
        for k in sorted(labels):
            f.write(f"{k} {labels[k]}\n")
    with open(os.path.join(args.output_dir, "decod"), "w") as f:
        for k in sorted(decods):
            f.write(f"{k} {decods[k]}\n")
    calc = Calculator(char_mode=args.char_mode)
    for k in sorted(labels):
        calc.calculate(k, labels[k], decods.get(k, ""))
    report = calc.summary()
    with open(os.path.join(args.output_dir, "wer"), "w") as f:
        f.write(report + "\n")
    return report


def main(argv=None):
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    # incompatible decode-flag combinations fail loudly BEFORE any model
    # load (a silently-ignored flag is worse than an error)
    if args.pipelined and (args.ctc_decoding or args.num_beams > 1
                           or args.speculative):
        raise SystemExit("--pipelined applies to plain (greedy/sampled) "
                         "decoding only")
    if args.num_beams > 1 and args.speculative:
        raise SystemExit("--speculative drafts plain greedy decoding; it "
                         "does not compose with --num_beams > 1")
    if args.num_beams > 1 and args.do_sample:
        raise SystemExit("beam search here is deterministic (HF "
                         "do_sample=False semantics); drop --do_sample or "
                         "--num_beams")
    os.makedirs(args.output_dir, exist_ok=True)

    if args.merge:
        print(merge_and_score(args))
        return

    if args.quantize != "none":
        # streaming load: tensor-by-tensor host read -> int8 -> device, so
        # the bf16 decoder never materializes (8B on one 16 GB chip). LoRA
        # checkpoints can't stream-fold — fall back to load+merge+quantize.
        from mtasr_tpu.utils.model_io import load_model_quantized
        from mtasr_tpu.utils.quantize import quantize_for_serving
        try:
            cfg, params = load_model_quantized(
                args.model_name_or_path, mode=args.quantize,
                scope=args.quantize_scope)
            logger.info("stream-quantized %s for serving: %s",
                        args.quantize_scope, args.quantize)
        except ValueError:
            cfg, params = load_model(args.model_name_or_path)
            from mtasr_tpu.train.lora import merge_decoder_lora
            params = merge_decoder_lora(params)
            params = quantize_for_serving(params, mode=args.quantize,
                                          scope=args.quantize_scope)
            logger.info("quantized %s for serving (LoRA fold path): %s",
                        args.quantize_scope, args.quantize)
    else:
        cfg, params = load_model(args.model_name_or_path)
    if args.instruct:
        cfg.instruct = True

    # device mesh (reference inference_asr_gpus.py shards at the *process*
    # level over NCCL; here one process drives a dp x tp mesh, and
    # --shard_index/--num_shards still splits work across hosts)
    import jax
    from mtasr_tpu.parallel import multihost
    from mtasr_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    multihost.initialize()
    tp = max(1, args.tp_size)
    dp = args.dp_size if args.dp_size > 0 else max(1, jax.device_count() // tp)
    mesh = make_mesh(dp_size=dp, tp_size=tp) if dp * tp > 1 else None
    if mesh is not None:
        params = shard_params(params, mesh)
        logger.info("sharded params over mesh %s", dict(mesh.shape))
        # under a mesh the Pallas kernels need their SPMD partitioning
        # rules (ops/pallas/spmd.py) — a bare pallas_call is a Mosaic
        # custom call the partitioner would otherwise gather the whole
        # KV cache (decode) / q,k,v (encoder flash) for, on every chip
        if cfg.decoder.decode_attn_impl == "pallas":
            cfg.decoder.decode_attn_impl = "pallas_spmd"
        if (cfg.encoder.attention_impl == "flash"
                or (cfg.encoder.attention_impl == "auto"
                    and jax.default_backend() != "cpu")):
            cfg.encoder.attention_impl = "flash_spmd"
    if args.tokenizer_name:
        tokenizer = HFTokenizer(args.tokenizer_name)
    else:
        saved = os.path.join(args.model_name_or_path, "char_tokenizer.json")
        if os.path.exists(saved):
            tokenizer = CharTokenizer.load(saved)
        else:
            tokenizer = CharTokenizer()
            sp = tokenizer.add_special_tokens(instruct=cfg.instruct)
            cfg.pad_token_id, cfg.sc_token_id = sp.pad_token_id, sp.sc_token_id

    dc = DataConfig(max_duration_in_seconds=args.max_duration_in_seconds,
                    min_duration_in_seconds=args.min_duration_in_seconds,
                    do_lower_case=args.do_lower_case)
    utts = load_kaldi_dir(args.data_dir, prompt=args.prompt)
    if args.max_eval_samples:
        utts = utts[: args.max_eval_samples]
    from mtasr_tpu.data.pipeline import prepare_examples
    examples = prepare_examples(
        utts, tokenizer, dc, cfg.instruct, lazy=not args.eager_audio,
        num_proc=args.preprocessing_num_workers)
    refs = {u.utt_id: (u.text.lower() if dc.do_lower_case else u.text)
            for u in utts}

    gen = GenerationConfig(max_length=args.max_length,
                           do_sample=args.do_sample,
                           temperature=args.temperature, top_k=args.top_k,
                           top_p=args.top_p, kv_quant=args.kv_quant,
                           encode_chunk=args.encode_chunk,
                           speculative=args.speculative,
                           spec_k=args.spec_k)

    label_f = open(os.path.join(args.output_dir,
                                f"label.{args.shard_index}"), "w")
    decod_f = open(os.path.join(args.output_dir,
                                f"decod.{args.shard_index}"), "w")
    n_done = 0

    def emit_batch(batch, seqs):
        nonlocal n_done
        for i, utt_id in enumerate(batch.utt_ids):
            # reference scoring keeps <sc> as a token in BOTH streams
            # (inference_asr.py:158-165, 202-209)
            from mtasr_tpu.utils.wer import clean_decoded_text
            hyp = clean_decoded_text(
                tokenizer.decode(seqs[i], skip_special_tokens=False))
            ref = clean_decoded_text(refs[utt_id])
            label_f.write(f"{utt_id} {ref}\n")
            decod_f.write(f"{utt_id} {hyp}\n")
        n_done += len(batch.utt_ids)
        logger.info("decoded %d utts", n_done)

    # --pipelined: buffer consecutive same-shape batches and decode each
    # run through the fused stream engine (one compiled program per batch,
    # encode(i+1) under decode(i)); shape changes flush the run
    pipeline_run = []   # [(batch, feed_dict)]

    def flush_pipeline():
        if not pipeline_run:
            return
        from mtasr_tpu.generate.pipelined import generate_pipelined
        outs = generate_pipelined(params, cfg,
                                  [d for _, d in pipeline_run], gen=gen)
        for (b, _), out in zip(pipeline_run, outs):
            emit_batch(b, np.asarray(out.sequences))
        pipeline_run.clear()

    for batch in batches_from_examples(
            examples, cfg, dc, args.batch_size, training=False,
            shuffle=False, drop_last=False,
            shard_index=args.shard_index, num_shards=args.num_shards):
        wav = jnp.asarray(batch.arrays["input_values"])
        amask = jnp.asarray(batch.arrays["audio_mask"])
        if mesh is not None:
            sharded = shard_batch({"input_values": wav, "audio_mask": amask},
                                  mesh)
            wav, amask = sharded["input_values"], sharded["audio_mask"]
        if args.ctc_decoding:
            trans, _ = generate_ctc(params, cfg, wav, amask,
                                    max_out_len=args.max_length)
            emit_batch(batch, np.asarray(trans))
        elif args.num_beams > 1:
            from mtasr_tpu.generate.beam import beam_generate
            prompt = (jnp.asarray(batch.arrays["prompt_ids"])
                      if "prompt_ids" in batch.arrays else None)
            out = beam_generate(params, cfg, wav, amask, prompt_ids=prompt,
                                num_beams=args.num_beams,
                                max_new_tokens=args.max_length,
                                length_penalty=args.length_penalty,
                                kv_quant=args.kv_quant,
                                encode_chunk=args.encode_chunk)
            emit_batch(batch, np.asarray(out.sequences)[:, 0])  # best beam
        elif args.pipelined:
            feed = {"input_values": wav, "audio_mask": amask}
            if "prompt_ids" in batch.arrays:
                feed["prompt_ids"] = jnp.asarray(batch.arrays["prompt_ids"])
            if pipeline_run and (
                    pipeline_run[-1][1].keys() != feed.keys()
                    or any(pipeline_run[-1][1][k].shape != feed[k].shape
                           for k in feed)):
                flush_pipeline()
            pipeline_run.append((batch, feed))
        else:
            prompt = (jnp.asarray(batch.arrays["prompt_ids"])
                      if "prompt_ids" in batch.arrays else None)
            out = generate(params, cfg, wav, amask, prompt_ids=prompt, gen=gen)
            emit_batch(batch, np.asarray(out.sequences))
    flush_pipeline()
    label_f.close()
    decod_f.close()

    if args.num_shards == 1:
        print(merge_and_score(args))


if __name__ == "__main__":
    main()
