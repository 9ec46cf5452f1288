"""Aux subsystem tests: tokenizer persistence, profiling utils, multihost
helpers (single-host no-op semantics), pipeline stage runner."""
import os

import numpy as np

import jax

from mtasr_tpu.data.tokenizer import CharTokenizer, load_tokenizer
from mtasr_tpu.parallel.multihost import barrier, host_broadcast, process_shard
from mtasr_tpu.utils.profiling import StepTimer, device_memory_stats


def test_char_tokenizer_roundtrip(tmp_path):
    tok = CharTokenizer()
    sp = tok.add_special_tokens(instruct=True)
    path = str(tmp_path / "char_tokenizer.json")
    tok.save(path)
    tok2 = load_tokenizer(path)
    assert tok2.vocab == tok.vocab
    assert tok2.pad_token_id == sp.pad_token_id
    text = "hello<sc>world"
    assert tok2.encode(text) == tok.encode(text)
    assert tok2.decode(tok.encode(text)) == "helloworld"


def test_load_tokenizer_from_model_dir(tmp_path):
    tok = CharTokenizer()
    tok.add_special_tokens()
    d = tmp_path / "model"
    d.mkdir()
    tok.save(str(d / "char_tokenizer.json"))
    tok2 = load_tokenizer(str(d))
    assert tok2.vocab == tok.vocab


def test_step_timer():
    t = StepTimer()
    t.update(8)
    t.update(8)
    m = t.metrics("train")
    assert m["train_samples_per_second"] > 0
    assert m["train_steps_per_second"] > 0


def test_multihost_single_host_noops():
    assert jax.process_count() == 1
    sl = process_shard(10)
    assert sl == slice(0, 10)
    barrier()  # no-op
    x = np.arange(4)
    np.testing.assert_array_equal(host_broadcast(x), x)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_pipeline_run_name_encoding():
    import argparse
    from mtasr_tpu.cli.run_pipeline import encode_run_name
    ns = argparse.Namespace(
        dataset_name="libri2mix", train_mode="hybrid", talker_ctc=True,
        talker_numbers=2, ctc_bridge=True, ctc_bridge_type="softmax",
        decoder_cross_attention=True, decoder_cross_attention_type="gatetiny",
        instruct=False, learning_rate=3e-5)
    name = encode_run_name(ns)
    assert "libri2mix" in name and "hybrid" in name and "ctc2" in name
    assert "bridge-softmax" in name and "xattn-gatetiny" in name
