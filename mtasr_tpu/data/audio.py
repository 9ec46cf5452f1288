"""Host-side audio IO + feature extraction.

Reference equivalents:
* Kaldi-style wav.scp/text parsing + LibriMix directory conventions
  (/root/reference/utils/generate_dataset.py:100-159, incl. `_mini` mode)
* waveform 'feature extraction' = per-utterance zero-mean/unit-variance
  normalization, the Wav2Vec2FeatureExtractor contract the reference uses
  (vectorized_dataset_utils.py:82-87; do_normalize=True semantics)
* 16 kHz resample cast (utils/resample_dataset_utils.py)

Pure numpy + stdlib `wave` (soundfile is not in the image); PCM16/24/32 and
float32 WAVs supported.
"""
from __future__ import annotations

import os
import wave
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (mono float32 waveform in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        vals = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        data = vals.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def write_wav(path: str, wav_data: np.ndarray, sr: int = 16000) -> None:
    pcm = np.clip(wav_data, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def resample(wav_data: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample via scipy (cast to 16 kHz, reference
    resample_dataset_utils.py)."""
    if sr == target_sr:
        return wav_data
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(sr, target_sr)
    return resample_poly(wav_data, target_sr // g, sr // g).astype(np.float32)


def normalize_waveform(wav_data: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Wav2Vec2FeatureExtractor zero-mean unit-variance normalization."""
    mean = wav_data.mean()
    var = wav_data.var()
    return ((wav_data - mean) / np.sqrt(var + eps)).astype(np.float32)


# ---------------------------------------------------------------------------
# Kaldi-style manifest parsing
# ---------------------------------------------------------------------------
def read_scp(path: str) -> Dict[str, str]:
    """wav.scp / text: 'utt_id <value...>' per line."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(None, 1)
            out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


@dataclass
class Utterance:
    utt_id: str
    wav_path: str
    text: str
    prompt: str = ""


def load_kaldi_dir(data_dir: str, prompt: str = "") -> List[Utterance]:
    """data_dir with wav.scp + text (reference process_split,
    generate_dataset.py:142-159)."""
    wavs = read_scp(os.path.join(data_dir, "wav.scp"))
    texts = read_scp(os.path.join(data_dir, "text"))
    prompts = {}
    ppath = os.path.join(data_dir, "prompt")
    if os.path.exists(ppath):
        prompts = read_scp(ppath)
    utts = []
    for utt_id, wav_path in wavs.items():
        if utt_id not in texts:
            continue
        utts.append(Utterance(utt_id, wav_path, texts[utt_id],
                              prompts.get(utt_id, prompt)))
    return utts


def build_file_paths(root: str, dataset_name: str) -> Dict[str, str]:
    """LibriMix split-dir conventions incl. `_mini` (train dir reused for
    all splits — generate_dataset.py:100-119)."""
    mini = dataset_name.endswith("_mini")
    base = os.path.join(root, dataset_name[:-5] if mini else dataset_name)
    if mini:
        return {"train": os.path.join(base, "train"),
                "validation": os.path.join(base, "train"),
                "test": os.path.join(base, "train")}
    return {"train": os.path.join(base, "train"),
            "validation": os.path.join(base, "dev"),
            "test": os.path.join(base, "test")}
