"""Instruct-mode end-to-end CLI: assembly with the 6 prompt/speech/response
specials, training with prompt-aware label surgery, prompted inference."""
import os

import numpy as np

from mtasr_tpu.data.audio import write_wav


def test_instruct_cli_pipeline(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(0)
    texts = ["hi there<sc>good day", "one two<sc>three four"]
    with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
        for i, t in enumerate(texts):
            p = str(d / f"u{i}.wav")
            write_wav(p, rng.standard_normal(8000) * 0.1)
            fw.write(f"u{i} {p}\n")
            ft.write(f"u{i} {t}\n")

    model_dir = str(tmp_path / "model0")
    exp_dir = str(tmp_path / "exp")
    dec_dir = str(tmp_path / "dec")

    from mtasr_tpu.cli.create_from_pretrained import main as create_main
    create_main(["--init_random", "tiny", "--talker_ctc", "--instruct",
                 "--train_mode", "hybrid", "--output_dir", model_dir,
                 "--check_generate"])
    assert os.path.exists(os.path.join(model_dir, "char_tokenizer.json"))

    from mtasr_tpu.cli.finetune_asr import main as finetune_main
    finetune_main([
        "--model_name_or_path", model_dir, "--data_dir", str(d),
        "--output_dir", exp_dir, "--train_mode", "hybrid", "--talker_ctc",
        "--instruct", "--prompt", "transcribe the two speakers",
        "--per_device_train_batch_size", "2",
        "--max_duration_in_seconds", "2.0", "--learning_rate", "1e-3",
        "--warmup_steps", "1", "--logging_steps", "1", "--save_steps", "5",
        "--max_steps", "2", "--eval_steps", "100",
        # dp_size 1: see test_cli_e2e.py — one-core host, 8-way SPMD of this
        # model trips XLA:CPU's 40 s collective rendezvous abort
        "--dp_size", "1"])
    final = os.path.join(exp_dir, "final")
    assert os.path.exists(os.path.join(final, "model.safetensors"))
    assert os.path.exists(os.path.join(exp_dir, "metrics.jsonl"))

    from mtasr_tpu.cli.inference_asr import main as infer_main
    infer_main([
        "--model_name_or_path", final, "--data_dir", str(d),
        "--output_dir", dec_dir, "--batch_size", "2", "--instruct",
        "--prompt", "transcribe the two speakers",
        "--max_duration_in_seconds", "2.0", "--max_length", "8"])
    assert "Overall ->" in open(os.path.join(dec_dir, "wer")).read()
