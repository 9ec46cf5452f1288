"""ctypes bindings for the native C++ runtime components (native/*.cpp).

The shared library is built on first use with g++ (baked into the image) and
cached under native/build/. Every binding has a pure-Python fallback so the
framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libwer.so")
_AUDIO_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libaudio.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False
_audio_lib: Optional[ctypes.CDLL] = None
_audio_lib_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wer_align.restype = ctypes.c_int64
        lib.wer_align.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.wer_align_ops.restype = ctypes.c_int64
        lib.wer_align_ops.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.wer_align_batch.restype = None
        lib.cpwer_best_perm.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def get_audio_lib() -> Optional[ctypes.CDLL]:
    """native/audio_loader.cpp — multithreaded batch WAV decode+normalize
    (the runtime analog of the reference's libsndfile-backed HF Audio
    decoding). None when the toolchain/lib is unavailable; every caller
    has a pure-Python fallback (data/audio.py)."""
    global _audio_lib, _audio_lib_tried
    if _audio_lib is not None or _audio_lib_tried:
        return _audio_lib
    _audio_lib_tried = True
    if not os.path.exists(_AUDIO_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_AUDIO_LIB_PATH)
        lib.wav_header.restype = ctypes.c_int
        lib.wav_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.wav_load.restype = ctypes.c_int64
        lib.wav_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.wav_load_batch.restype = None
        lib.wav_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        _audio_lib = lib
    except OSError:
        _audio_lib = None
    return _audio_lib


def wav_header_native(path: str) -> Optional[Tuple[int, int, int]]:
    """(n_frames, sample_rate, channels) from the WAV header, or None."""
    lib = get_audio_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.wav_header(path.encode(), ctypes.byref(n), ctypes.byref(sr),
                        ctypes.byref(ch))
    if rc != 0:
        return None
    return int(n.value), int(sr.value), int(ch.value)


def wav_load_batch_native(
    paths: Sequence[str], out: np.ndarray, target_sr: int,
    *, normalize: bool = True, n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode B WAV files in parallel into out [B, cap] float32 (row b gets
    lens[b] valid samples, remainder untouched). Returns (lens, status) or
    None when the native lib is unavailable.

    status per row: 0 ok, 1 open/parse error, 2 sample-rate mismatch
    (caller must route that row through the Python resample path), 3
    unsupported encoding.
    """
    lib = get_audio_lib()
    if lib is None:
        return None
    assert out.dtype == np.float32 and out.ndim == 2
    assert out.flags["C_CONTIGUOUS"]
    B, cap = out.shape
    assert len(paths) == B
    blob = b"".join(p.encode() for p in paths)
    off = np.zeros(B + 1, np.int64)
    for i, p in enumerate(paths):
        off[i + 1] = off[i] + len(p.encode())
    lens = np.zeros(B, np.int64)
    status = np.zeros(B, np.int32)
    if n_threads <= 0:
        n_threads = min(B, os.cpu_count() or 1)
    lib.wav_load_batch(
        blob, off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), B,
        target_sr, 1 if normalize else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    return lens, status


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int32))


def wer_align_native(lab_ids: Sequence[int],
                     rec_ids: Sequence[int]) -> Optional[Tuple[int, ...]]:
    """Returns (all, cor, sub, del, ins) or None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lab = _as_i32(lab_ids)
    rec = _as_i32(rec_ids)
    counts = np.zeros(5, np.int64)
    lib.wer_align(
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(lab),
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(rec),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return tuple(int(x) for x in counts)


def wer_align_ops_native(
        lab_ids: Sequence[int], rec_ids: Sequence[int]
) -> Optional[Tuple[Tuple[int, ...], np.ndarray]]:
    """Counts + traceback ops (left-to-right, 1=cor 2=sub 3=del 4=ins) for
    rebuilding the reference's verbose alignment dumps natively. None if
    the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lab = _as_i32(lab_ids)
    rec = _as_i32(rec_ids)
    counts = np.zeros(5, np.int64)
    ops = np.zeros(len(lab) + len(rec), np.uint8)
    n_ops = lib.wer_align_ops(
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(lab),
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(rec),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return tuple(int(x) for x in counts), ops[:int(n_ops)]


def _pack(seqs: Sequence[Sequence[int]]):
    off = np.zeros(len(seqs) + 1, np.int64)
    for i, s in enumerate(seqs):
        off[i + 1] = off[i] + len(s)
    flat = np.zeros(int(off[-1]), np.int32)
    for i, s in enumerate(seqs):
        flat[off[i]:off[i + 1]] = np.asarray(s, np.int32)
    return flat, off


def wer_align_batch_native(lab_seqs: Sequence[Sequence[int]],
                           rec_seqs: Sequence[Sequence[int]]
                           ) -> Optional[np.ndarray]:
    """Returns [P, 5] counts or None."""
    lib = get_lib()
    if lib is None:
        return None
    lab_flat, lab_off = _pack(lab_seqs)
    rec_flat, rec_off = _pack(rec_seqs)
    out = np.zeros((len(lab_seqs), 5), np.int64)
    lib.wer_align_batch(
        lab_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lab_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rec_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rec_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(lab_seqs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def cpwer_native(ref_seqs: Sequence[Sequence[int]],
                 hyp_seqs: Sequence[Sequence[int]]
                 ) -> Optional[Tuple[float, Tuple[int, ...]]]:
    lib = get_lib()
    if lib is None:
        return None
    K = max(len(ref_seqs), len(hyp_seqs))
    refs = list(ref_seqs) + [[]] * (K - len(ref_seqs))
    hyps = list(hyp_seqs) + [[]] * (K - len(hyp_seqs))
    ref_flat, ref_off = _pack(refs)
    hyp_flat, hyp_off = _pack(hyps)
    err = ctypes.c_int64()
    total = ctypes.c_int64()
    perm = np.zeros(K, np.int64)
    lib.cpwer_best_perm(
        ref_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ref_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hyp_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hyp_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        K, ctypes.byref(err), ctypes.byref(total),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    wer_pct = 100.0 * err.value / max(total.value, 1)
    return wer_pct, tuple(int(p) for p in perm)
