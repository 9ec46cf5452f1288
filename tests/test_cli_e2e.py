"""Full-stack CLI integration test: create composite -> finetune (few steps,
with resume) -> batched inference -> WER report. Mirrors the reference's
stage pipeline (run.sh stages 2-5) on a generated mini dataset — the `_mini`
fixture pattern (SURVEY.md §4)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mtasr_tpu.data.audio import write_wav


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("libri2mix_mini")
    d = root / "train"
    d.mkdir()
    rng = np.random.default_rng(0)
    texts = ["hi there<sc>good day", "one two<sc>three four",
             "cat sat<sc>dog ran", "go now<sc>stay here"]
    with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
        for i, t in enumerate(texts):
            p = str(d / f"u{i}.wav")
            write_wav(p, rng.standard_normal(8000) * 0.1)
            fw.write(f"u{i} {p}\n")
            ft.write(f"u{i} {t}\n")
    return str(root)


def test_cli_pipeline(mini_dataset, tmp_path):
    model_dir = str(tmp_path / "model0")
    exp_dir = str(tmp_path / "exp")
    dec_dir = str(tmp_path / "decode")

    from mtasr_tpu.cli.create_from_pretrained import main as create_main
    create_main(["--init_random", "tiny", "--talker_ctc",
                 "--train_mode", "hybrid", "--output_dir", model_dir,
                 "--check_generate"])
    assert os.path.exists(os.path.join(model_dir, "model.safetensors"))

    from mtasr_tpu.cli.tools import main as tools_main
    tools_main(["check-keys", "--model_dir", model_dir])

    from mtasr_tpu.cli.finetune_asr import main as finetune_main
    common = [
        "--model_name_or_path", model_dir,
        "--data_dir", os.path.join(mini_dataset, "train"),
        "--output_dir", exp_dir,
        "--train_mode", "hybrid", "--talker_ctc",
        "--per_device_train_batch_size", "2",
        "--per_device_eval_batch_size", "2",
        "--max_duration_in_seconds", "2.0",
        "--learning_rate", "1e-3", "--warmup_steps", "1",
        "--logging_steps", "1", "--eval_steps", "100",
        "--save_steps", "2", "--max_steps", "3",
        # dp_size 1: this host has ONE core emulating 8 virtual devices;
        # 8-way SPMD of the 19M-param CLI model starves XLA:CPU's collective
        # rendezvous (40 s timeout -> hard abort). Mesh execution itself is
        # covered by test_train_round2::test_trainer_mesh_matches_single_device
        "--dp_size", "1",
    ]
    finetune_main(common)
    final_dir = os.path.join(exp_dir, "final")
    assert os.path.exists(os.path.join(final_dir, "model.safetensors"))
    assert any(n.startswith("checkpoint-") for n in os.listdir(exp_dir))

    # resume path: bump max_steps, rerun -> resumes from checkpoint-3
    finetune_main([a if a != "3" else "5" for a in common])

    from mtasr_tpu.cli.inference_asr import main as infer_main
    infer_main([
        "--model_name_or_path", final_dir,
        "--data_dir", os.path.join(mini_dataset, "train"),
        "--output_dir", dec_dir, "--batch_size", "2",
        "--max_duration_in_seconds", "2.0", "--max_length", "12",
        "--dp_size", "1",
    ])
    for name in ("label", "decod", "wer"):
        assert os.path.exists(os.path.join(dec_dir, name)), name
    report = open(os.path.join(dec_dir, "wer")).read()
    assert "Overall ->" in report

    # --pipelined: fused stream engine through the same CLI; must be
    # token-identical to the plain decode above
    dec5 = str(tmp_path / "decode_pipelined")
    infer_main([
        "--model_name_or_path", final_dir,
        "--data_dir", os.path.join(mini_dataset, "train"),
        "--output_dir", dec5, "--batch_size", "2", "--pipelined",
        "--max_duration_in_seconds", "2.0", "--max_length", "12",
        "--dp_size", "1",
    ])
    assert (open(os.path.join(dec5, "decod")).read()
            == open(os.path.join(dec_dir, "decod")).read())

    # CTC decoding path through the same CLI
    dec2 = str(tmp_path / "decode_ctc")
    infer_main([
        "--model_name_or_path", final_dir,
        "--data_dir", os.path.join(mini_dataset, "train"),
        "--output_dir", dec2, "--batch_size", "2", "--ctc_decoding",
        "--max_duration_in_seconds", "2.0", "--max_length", "12",
        "--dp_size", "1",
    ])
    assert os.path.exists(os.path.join(dec2, "wer"))

    # int8 serving path (w8a8 decoder + int8 KV cache) through the same CLI
    dec4 = str(tmp_path / "decode_int8")
    infer_main([
        "--model_name_or_path", final_dir,
        "--data_dir", os.path.join(mini_dataset, "train"),
        "--output_dir", dec4, "--batch_size", "2",
        "--quantize", "w8a8", "--kv_quant",
        "--max_duration_in_seconds", "2.0", "--max_length", "12",
        "--dp_size", "1",
    ])
    assert os.path.exists(os.path.join(dec4, "wer"))

    # sharded inference + merge (multi-host pattern)
    dec3 = str(tmp_path / "decode_sharded")
    for shard in (0, 1):
        infer_main([
            "--model_name_or_path", final_dir,
            "--data_dir", os.path.join(mini_dataset, "train"),
            "--output_dir", dec3, "--batch_size", "2",
            "--shard_index", str(shard), "--num_shards", "2",
            "--max_duration_in_seconds", "2.0", "--max_length", "8",
            "--dp_size", "1",
        ])
    infer_main(["--model_name_or_path", final_dir,
                "--data_dir", os.path.join(mini_dataset, "train"),
                "--output_dir", dec3, "--num_shards", "2", "--merge"])
    merged = open(os.path.join(dec3, "decod")).read().splitlines()
    assert len(merged) == 4  # all utts present after merge

    # extract + partial-restore tooling
    ext_dir = str(tmp_path / "sep_ctc")
    tools_main(["extract", "--model_dir", final_dir,
                "--output_dir", ext_dir,
                "--prefixes", "separator,serialized_ctc"])
    from mtasr_tpu.utils.model_io import load_model
    _, sub = load_model(ext_dir)
    assert set(sub) == {"separator", "serialized_ctc"}
