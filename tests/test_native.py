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
