"""Native C++ WER kernel: builds with g++, matches the Python alignment
exactly, and is substantially faster on long sequences."""
import time

import numpy as np
import pytest

from mtasr_tpu.utils.native import (
    cpwer_native, get_lib, wer_align_batch_native, wer_align_native,
)
from mtasr_tpu.utils.wer import Calculator, align, cpwer


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of native/wer_kernel.cpp failed"


@pytest.mark.parametrize("seed", range(5))
def test_native_align_matches_python(seed):
    rng = np.random.default_rng(seed)
    n, m, v = rng.integers(0, 40, 3)
    lab = rng.integers(0, max(v, 2), n).tolist()
    rec = rng.integers(0, max(v, 2), m).tolist()
    counts = wer_align_native(lab, rec)
    ref = align([str(x) for x in lab], [str(x) for x in rec])
    assert counts == (ref.all, ref.cor, ref.sub, ref.dele, ref.ins)


def test_native_batch():
    rng = np.random.default_rng(9)
    labs = [rng.integers(0, 5, rng.integers(1, 20)).tolist() for _ in range(8)]
    recs = [rng.integers(0, 5, rng.integers(1, 20)).tolist() for _ in range(8)]
    out = wer_align_batch_native(labs, recs)
    assert out is not None
    for p in range(8):
        assert tuple(out[p]) == wer_align_native(labs[p], recs[p])


@pytest.mark.parametrize("seed", range(5))
def test_native_alignment_matches_python(seed):
    """need_alignment=True path: native traceback ops must rebuild the
    EXACT alignment strings the pure-Python DP produces (same preference
    order del > ins > diag) — the default verbose scoring path
    (compute-wer --v=1, run.sh:316-319) runs natively (VERDICT r4 #7)."""
    rng = np.random.default_rng(100 + seed)
    words = [f"w{i}" for i in range(12)]
    c_nat = Calculator(use_native=True)
    c_py = Calculator(use_native=False)
    for u in range(20):
        ref = " ".join(words[k]
                       for k in rng.integers(0, 12, rng.integers(0, 10)))
        hyp = " ".join(words[k]
                       for k in rng.integers(0, 12, rng.integers(0, 10)))
        s_n = c_nat.calculate(f"u{u}", ref, hyp, need_alignment=True)
        s_p = c_py.calculate(f"u{u}", ref, hyp, need_alignment=True)
        assert s_n.lab_align == s_p.lab_align, (ref, hyp)
        assert s_n.rec_align == s_p.rec_align, (ref, hyp)
        assert (s_n.all, s_n.cor, s_n.sub, s_n.dele, s_n.ins) == \
            (s_p.all, s_p.cor, s_p.sub, s_p.dele, s_p.ins)


def test_calculator_native_vs_python_identical():
    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(20)]
    pairs = []
    for _ in range(30):
        ref = " ".join(words[k] for k in rng.integers(0, 20, rng.integers(1, 15)))
        hyp = " ".join(words[k] for k in rng.integers(0, 20, rng.integers(1, 15)))
        pairs.append((ref, hyp))
    c_nat = Calculator(use_native=True)
    c_py = Calculator(use_native=False)
    for i, (r, h) in enumerate(pairs):
        c_nat.calculate(f"u{i}", r, h)
        c_py.calculate(f"u{i}", r, h)
    t1, t2 = c_nat.overall(), c_py.overall()
    assert (t1.all, t1.cor, t1.sub, t1.dele, t1.ins) == \
        (t2.all, t2.cor, t2.sub, t2.dele, t2.ins)


def test_native_cpwer_matches_python():
    refs = ["hello world how are you", "good day to you sir"]
    hyps = ["good day to you sir", "hello world how are u"]
    w_n, p_n = cpwer(refs, hyps)          # routes through native when built
    # force the python path
    from mtasr_tpu.utils import wer as wer_mod
    toks_r = [r.split() for r in refs]
    toks_h = [h.split() for h in hyps]
    errs = np.zeros((2, 2))
    alls = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            s = align(toks_r[i], toks_h[j])
            errs[i, j], alls[i, j] = s.errors, s.all
    best = min(
        (100.0 * (errs[0, p[0]] + errs[1, p[1]]) /
         (alls[0, p[0]] + alls[1, p[1]]), p)
        for p in [(0, 1), (1, 0)])
    assert abs(w_n - best[0]) < 1e-9
    assert tuple(p_n) == best[1]


# ---------------------------------------------------------------------------
# native audio loader (native/audio_loader.cpp)
# ---------------------------------------------------------------------------
def _write_test_wav(path, data, sr=16000, width=2, channels=1):
    import wave
    data = np.asarray(data, np.float32)
    if channels > 1:
        data = np.stack([data] * channels, axis=1)
    flat = np.clip(data, -1.0, 1.0).reshape(-1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            w.writeframes((flat * 32767.0).astype("<i2").tobytes())
        elif width == 4:
            w.writeframes((flat * 2147483647.0).astype("<i4").tobytes())
        elif width == 1:
            w.writeframes(
                ((flat * 127.0) + 128.0).astype(np.uint8).tobytes())
        elif width == 3:
            v = (flat * float((1 << 23) - 1)).astype(np.int32)
            b = np.zeros((len(v), 3), np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            w.writeframes(b.tobytes())


def test_audio_lib_builds():
    from mtasr_tpu.utils.native import get_audio_lib
    assert get_audio_lib() is not None, "native/audio_loader.cpp build failed"


@pytest.mark.parametrize("width,channels", [(2, 1), (2, 2), (4, 1), (1, 1),
                                            (3, 1)])
def test_wav_load_matches_python_reader(tmp_path, width, channels):
    """Native decode+downmix+normalize == the Python read_wav+normalize
    path across PCM widths and channel counts."""
    from mtasr_tpu.data.audio import normalize_waveform, read_wav
    from mtasr_tpu.utils.native import wav_load_batch_native

    rng = np.random.default_rng(width * 10 + channels)
    data = (rng.standard_normal(4321) * 0.2).astype(np.float32)
    p = tmp_path / f"w{width}c{channels}.wav"
    _write_test_wav(p, data, width=width, channels=channels)

    py_wav, sr = read_wav(str(p))
    assert sr == 16000
    py_norm = normalize_waveform(py_wav)

    out = np.zeros((1, 5000), np.float32)
    res = wav_load_batch_native([str(p)], out, 16000)
    assert res is not None
    lens, status = res
    assert status[0] == 0 and lens[0] == len(py_wav)
    np.testing.assert_allclose(out[0, :lens[0]], py_norm, atol=2e-4)
    assert np.all(out[0, lens[0]:] == 0)


def test_wav_header_native(tmp_path):
    from mtasr_tpu.utils.native import wav_header_native
    p = tmp_path / "h.wav"
    _write_test_wav(p, np.zeros(777, np.float32), sr=8000, channels=2)
    hdr = wav_header_native(str(p))
    assert hdr == (777, 8000, 2)
    assert wav_header_native(str(tmp_path / "missing.wav")) is None


def test_wav_load_batch_status_codes(tmp_path):
    """sr mismatch -> status 2 (Python fallback), missing file -> 1,
    good rows decode regardless of bad neighbors."""
    from mtasr_tpu.utils.native import wav_load_batch_native
    ok = tmp_path / "ok.wav"
    bad_sr = tmp_path / "sr8k.wav"
    _write_test_wav(ok, np.ones(100, np.float32) * 0.1)
    _write_test_wav(bad_sr, np.ones(100, np.float32) * 0.1, sr=8000)
    out = np.zeros((3, 200), np.float32)
    lens, status = wav_load_batch_native(
        [str(ok), str(bad_sr), str(tmp_path / "nope.wav")], out, 16000)
    assert status.tolist() == [0, 2, 1]
    assert lens.tolist() == [100, 0, 0]


def test_collate_native_path_matches_python(tmp_path, monkeypatch):
    """collate produces identical batches with and without the native
    loader (lazy examples, mixed lengths, one non-16k row forcing the
    per-row Python fallback)."""
    from mtasr_tpu.config import DataConfig
    from mtasr_tpu.data import pipeline as pl
    from mtasr_tpu.data.audio import Utterance
    from mtasr_tpu.data.tokenizer import CharTokenizer
    from tests.test_composite import tiny_cfg

    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    tok = CharTokenizer()
    sp = tok.add_special_tokens()
    cfg.pad_token_id = sp.pad_token_id
    cfg.sc_token_id = sp.sc_token_id

    rng = np.random.default_rng(3)
    utts = []
    for i, n in enumerate([3000, 4500, 2500]):
        p = tmp_path / f"u{i}.wav"
        _write_test_wav(p, rng.standard_normal(n).astype(np.float32) * 0.3)
        utts.append(Utterance(f"u{i}", str(p), f"ab<sc>ba{i}"))
    # row 3: 8 kHz file -> native status 2 -> Python resample fallback
    p8 = tmp_path / "u3.wav"
    _write_test_wav(p8, rng.standard_normal(4000).astype(np.float32) * 0.3,
                    sr=8000)
    utts.append(Utterance("u3", str(p8), "ab<sc>b"))

    dc = DataConfig(min_duration_in_seconds=0.01,
                    max_duration_in_seconds=2.0,
                    bucket_boundaries_seconds=(0.5, 1.0))
    exs = [pl.prepare_example(u, tok, dc, lazy=True) for u in utts]
    assert all(e is not None for e in exs)

    b_native = pl.collate(exs, cfg, dc, training=False)
    monkeypatch.setattr(
        "mtasr_tpu.utils.native.wav_load_batch_native",
        lambda *a, **k: None)
    b_python = pl.collate(exs, cfg, dc, training=False)
    for k in b_native.arrays:
        np.testing.assert_allclose(
            b_native.arrays[k], b_python.arrays[k], atol=2e-4,
            err_msg=k)


def test_native_speedup():
    rng = np.random.default_rng(2)
    lab = rng.integers(0, 30, 800).tolist()
    rec = rng.integers(0, 30, 800).tolist()
    t0 = time.perf_counter()
    wer_align_native(lab, rec)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    align([str(x) for x in lab], [str(x) for x in rec])
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
