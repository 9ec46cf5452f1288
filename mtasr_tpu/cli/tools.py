"""Small checkpoint/scoring tools mirroring the reference utilities:

  extract      -- filter a model by top-level prefixes (encoder_extract.py,
                  utils/extract_sep_ctc.py)
  merge-lora   -- offline LoRA merge (utils/merge_adapter.py)
  compute-wer  -- standalone scorer (utils/compute-wer.py CLI)
  check-keys   -- key/shape dump (src/check_safetensors_keys.py,
                  utils/safetensor_checking_utils.py)
"""
from __future__ import annotations

import argparse
import sys


def cmd_extract(argv):
    p = argparse.ArgumentParser("tools extract")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--prefixes", default="separator,serialized_ctc")
    args = p.parse_args(argv)
    from mtasr_tpu.train.checkpoint import extract_by_prefix
    from mtasr_tpu.utils.model_io import load_model, save_model
    cfg, params = load_model(args.model_dir)
    sub = extract_by_prefix(params, tuple(args.prefixes.split(",")))
    save_model(args.output_dir, cfg, sub)
    print(f"extracted {list(sub)} -> {args.output_dir}")


def cmd_merge_lora(argv):
    p = argparse.ArgumentParser("tools merge-lora")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--output_dir", required=True)
    args = p.parse_args(argv)
    from mtasr_tpu.train.lora import merge_decoder_lora
    from mtasr_tpu.utils.model_io import load_model, save_model
    cfg, params = load_model(args.model_dir)
    save_model(args.output_dir, cfg, merge_decoder_lora(params))
    print(f"merged -> {args.output_dir}")


def cmd_compute_wer(argv):
    p = argparse.ArgumentParser("tools compute-wer")
    p.add_argument("ref")
    p.add_argument("hyp")
    p.add_argument("--char", type=int, default=0)
    p.add_argument("--cs", type=int, default=0)
    p.add_argument("--v", type=int, default=1)
    args = p.parse_args(argv)
    from mtasr_tpu.utils.wer import score_files
    print(score_files(args.ref, args.hyp, char_mode=bool(args.char),
                      case_sensitive=bool(args.cs), verbose=bool(args.v)))


def cmd_check_keys(argv):
    p = argparse.ArgumentParser("tools check-keys")
    p.add_argument("--model_dir", required=True)
    args = p.parse_args(argv)
    from mtasr_tpu.utils.model_io import load_model
    from mtasr_tpu.utils.torch_interop import tree_to_flat
    _, params = load_model(args.model_dir)
    for k, v in sorted(tree_to_flat(params).items()):
        print(f"{k}\t{tuple(v.shape)}\t{v.dtype}")


COMMANDS = {"extract": cmd_extract, "merge-lora": cmd_merge_lora,
            "compute-wer": cmd_compute_wer, "check-keys": cmd_check_keys}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: tools.py {{{','.join(COMMANDS)}}} ...")
        sys.exit(2)
    COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    main()
