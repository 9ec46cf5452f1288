"""run_pipeline stage 6: multi-shard decode + merge through the stage
machine (the reference's torch.distributed inference stage)."""
import os

import numpy as np

from mtasr_tpu.data.audio import write_wav


def test_pipeline_stage6_sharded(tmp_path):
    d = tmp_path / "data"
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

    from mtasr_tpu.cli.run_pipeline import main as pipeline_main
    root = str(tmp_path / "root")
    pipeline_main(["--stage", "1", "--stop_stage", "3", "--root", root,
                   "--data_dir", str(d), "--init_random", "tiny",
                   "--talker_ctc", "--train_mode", "hybrid",
                   "--max_steps", "2", "--per_device_train_batch_size", "2",
                   "--max_length", "6", "--dp_size", "1"])
    pipeline_main(["--stage", "6", "--stop_stage", "6", "--root", root,
                   "--data_dir", str(d), "--init_random", "tiny",
                   "--talker_ctc", "--train_mode", "hybrid",
                   "--num_shards", "2", "--max_length", "6", "--dp_size", "1"])
    exp = os.path.join(root, "exp")
    run_name = os.listdir(exp)[0]
    dec = os.path.join(exp, run_name, "decode_stage6")
    merged = open(os.path.join(dec, "decod")).read().splitlines()
    assert len(merged) == 4
    assert "Overall ->" in open(os.path.join(dec, "wer")).read()


def test_inference_cli_dp_tp_mesh(tmp_path):
    """inference_asr --dp_size/--tp_size end-to-end on the virtual mesh:
    builds the mesh, shards params, flips decode_attn_impl to
    pallas_spmd (the CLI's auto-selection), and decodes a batch — the
    serving configuration a real pod runs. (The tiny decoder's per-shard
    geometry is below the kernel's lane floor, so this exercises the
    sharded XLA fallback inside the partition; the kernel path is pinned
    by tests/test_spmd_kernels.py.)"""
    import jax
    if jax.device_count() != 8:
        import pytest
        pytest.skip("needs the 8-virtual-device CPU mesh")
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(1)
    texts = ["hi there<sc>good day", "one two<sc>three four",
             "cat sat<sc>dog ran", "go now<sc>stay here"]
    with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
        for i, t in enumerate(texts):
            p = str(d / f"u{i}.wav")
            write_wav(p, rng.standard_normal(8000) * 0.1)
            fw.write(f"u{i} {p}\n")
            ft.write(f"u{i} {t}\n")

    from mtasr_tpu.cli.run_pipeline import main as pipeline_main
    root = str(tmp_path / "root")
    pipeline_main(["--stage", "1", "--stop_stage", "3", "--root", root,
                   "--data_dir", str(d), "--init_random", "tiny",
                   "--talker_ctc", "--train_mode", "hybrid",
                   "--max_steps", "2", "--per_device_train_batch_size", "2",
                   "--max_length", "6", "--dp_size", "1"])
    exp = os.path.join(root, "exp")
    run_name = os.listdir(exp)[0]
    model_dir = os.path.join(exp, run_name, "final")

    from mtasr_tpu.cli.inference_asr import main as infer_main
    out = str(tmp_path / "decode_mesh")
    infer_main(["--model_name_or_path", model_dir,
                "--data_dir", str(d), "--output_dir", out,
                "--batch_size", "4", "--max_length", "6",
                "--dp_size", "4", "--tp_size", "2"])
    decod = open(os.path.join(out, "decod")).read().splitlines()
    assert len(decod) == 4
    assert "Overall ->" in open(os.path.join(out, "wer")).read()
