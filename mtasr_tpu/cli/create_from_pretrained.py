"""One-time composite assembly CLI (reference:
utils/create_from_pretrained.py:184-301): WavLM dir + LLaMA dir ->
composite model dir with special tokens wired and embeddings resized.
`--init_random` builds a randomly-initialized composite of a named geometry
instead (no pretrained dirs needed — useful where hub access is impossible).
"""
from __future__ import annotations

import argparse
import logging

import jax

from mtasr_tpu.data.tokenizer import CharTokenizer, HFTokenizer
from mtasr_tpu.utils.model_io import create_from_pretrained, save_model

logger = logging.getLogger("mtasr_tpu.create")


def main(argv=None):
    p = argparse.ArgumentParser("create_from_pretrained")
    p.add_argument("--encoder_dir", type=str, default=None)
    p.add_argument("--decoder_dir", type=str, default=None)
    p.add_argument("--tokenizer_name", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--instruct", action="store_true")
    p.add_argument("--talker_ctc", action="store_true")
    p.add_argument("--talker_numbers", type=int, default=2)
    p.add_argument("--separator_hidden", type=int, default=896)
    p.add_argument("--train_mode", type=str, default="attention")
    p.add_argument("--decoder_cross_attention", action="store_true")
    p.add_argument("--decoder_cross_attention_type", type=str, default="tiny")
    p.add_argument("--init_random", type=str, default=None,
                   choices=[None, "base-1b", "large-1b", "large-3b",
                            "large-8b", "tiny"],
                   help="skip pretrained dirs; random weights of a geometry")
    p.add_argument("--check_generate", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    tokenizer = (HFTokenizer(args.tokenizer_name) if args.tokenizer_name
                 else CharTokenizer())
    sp = tokenizer.add_special_tokens(instruct=args.instruct)
    special_ids = {
        "pad_token_id": sp.pad_token_id, "sc_token_id": sp.sc_token_id,
        "instruct": args.instruct,
    }
    if args.instruct:
        for k in ("bosp", "eosp", "boss", "eoss", "bosr", "eosr"):
            special_ids[f"{k}_token_id"] = getattr(sp, f"{k}_token_id")

    overrides = dict(
        talker_ctc=args.talker_ctc, talker_numbers=args.talker_numbers,
        separator_hidden=args.separator_hidden, train_mode=args.train_mode,
        decoder_cross_attention=args.decoder_cross_attention,
        decoder_cross_attention_type=args.decoder_cross_attention_type,
    )

    if args.init_random:
        from mtasr_tpu.config import (
            LlamaConfig, SpeechEncoderDecoderConfig, WavLMConfig,
            llama_1b_config, llama_3b_config, llama_8b_config,
            wavlm_base_config, wavlm_large_config,
        )
        from mtasr_tpu.models.speech_encoder_decoder import init_model_params
        geo = args.init_random
        if geo == "tiny":
            enc = WavLMConfig(hidden_size=64, num_hidden_layers=2,
                              num_attention_heads=4, intermediate_size=128,
                              do_stable_layer_norm=True,
                              feat_extract_norm="layer", conv_bias=True)
            dec = LlamaConfig(vocab_size=len(tokenizer), hidden_size=64,
                              intermediate_size=128, num_hidden_layers=2,
                              num_attention_heads=4, num_key_value_heads=2,
                              head_dim=16, bos_token_id=sp.bos_token_id,
                              eos_token_id=sp.eos_token_id)
        else:
            enc = (wavlm_base_config() if geo.startswith("base")
                   else wavlm_large_config())
            dec = {"1b": llama_1b_config, "3b": llama_3b_config,
                   "8b": llama_8b_config}[geo.split("-")[1]]()
            dec.vocab_size = max(dec.vocab_size, len(tokenizer))
        cfg = SpeechEncoderDecoderConfig(encoder=enc, decoder=dec, **overrides)
        cfg.decoder_start_token_id = dec.bos_token_id
        cfg.bos_token_id = dec.bos_token_id
        cfg.eos_token_id = dec.eos_token_id
        for k, v in special_ids.items():
            setattr(cfg, k, v)
        params = init_model_params(jax.random.key(0), cfg)
    else:
        cfg, params = create_from_pretrained(
            args.encoder_dir, args.decoder_dir, tokenizer_len=len(tokenizer),
            special_ids=special_ids, model_overrides=overrides)

    if args.check_generate:
        # dummy-generate smoke test (create_from_pretrained.py:287-297)
        import jax.numpy as jnp
        from mtasr_tpu.generate import generate
        wav = jnp.ones((1, 2000), jnp.float32)
        prompt = None
        if args.instruct:
            prompt = jnp.asarray([[sp.bosp_token_id, sp.eosp_token_id,
                                   sp.boss_token_id, sp.eoss_token_id,
                                   sp.bosr_token_id]])
        out = generate(params, cfg, wav, None, prompt_ids=prompt,
                       max_new_tokens=4)
        logger.info("check_generate OK: %s", out.sequences[0])

    save_model(args.output_dir, cfg, params)
    if isinstance(tokenizer, CharTokenizer):
        import os
        tokenizer.save(os.path.join(args.output_dir, "char_tokenizer.json"))
    logger.info("saved composite model to %s", args.output_dir)


if __name__ == "__main__":
    main()
