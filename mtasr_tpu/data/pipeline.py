"""End-to-end host data pipeline: utterances -> static-shape TPU batches.

Replaces the reference's HF datasets map/filter + dynamic-padding collator
(utils/vectorized_dataset_utils.py:26-124, src/data_collator.py:8-67) with a
bucketed, static-shape design: audio lengths snap to duration buckets and
label lengths to a fixed max, so every (audio_bucket, label_len) pair
compiles exactly once under jit.

Semantics preserved:
* per-utterance zero-mean/unit-var waveform normalization
* prompt templating + '<bos_prompt>...' tokenization in instruct mode
  (prompt_ids exclude BOS: vectorized_dataset_utils.py:98)
* BOS stripped from labels (collator lines 54-55), NO eos appended at
  collation (inserted later during label surgery: data_collator.py:57-59)
* duration filter min < len < max (vectorized_dataset_utils.py:113-121)
* SpecAugment mask indices computed host-side per batch
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from mtasr_tpu.config import DataConfig, SpeechEncoderDecoderConfig
from mtasr_tpu.data.audio import (
    Utterance, normalize_waveform, read_wav, resample,
)
from mtasr_tpu.data.labels import build_training_arrays
from mtasr_tpu.data.specaugment import compute_mask_indices
from mtasr_tpu.data.tokenizer import build_prompt_and_input


@dataclass
class PreparedExample:
    utt_id: str
    input_values: Optional[np.ndarray]  # normalized waveform; None = lazy
    labels: List[int]             # tokenized target (no BOS, no EOS)
    prompt_ids: List[int]         # instruct prompt ids (no BOS), may be []
    n_samples: int
    wav_path: Optional[str] = None  # set when lazy

    def waveform(self, dc: DataConfig) -> np.ndarray:
        """Materialize the normalized waveform (lazy examples load from
        disk here, at collate time — memory stays bounded by the batch)."""
        if self.input_values is not None:
            return self.input_values
        wav_data, sr = read_wav(self.wav_path)
        wav_data = resample(wav_data, sr, dc.sampling_rate)
        return normalize_waveform(wav_data)


def _wav_duration_samples(path: str, target_sr: int) -> int:
    """Sample count at target_sr from the WAV header only (no data read)."""
    from mtasr_tpu.utils.native import wav_header_native
    hdr = wav_header_native(path)
    if hdr is not None:
        n, sr = hdr[0], hdr[1]
    else:
        import wave
        with wave.open(path, "rb") as w:
            n, sr = w.getnframes(), w.getframerate()
    if sr == target_sr:
        return n
    # matches scipy resample_poly output length: ceil(n * up / down)
    from math import gcd
    g = gcd(sr, target_sr)
    up, down = target_sr // g, sr // g
    return -(-n * up // down)


def prepare_example(utt: Utterance, tokenizer, dc: DataConfig,
                    instruct: bool = False,
                    lazy: bool = False) -> Optional[PreparedExample]:
    """lazy=True reads only the WAV header (duration filter + bucketing
    need the length); samples load at collate time. This replaces the
    reference's eager datasets.map materialization
    (utils/vectorized_dataset_utils.py:26-124) with a design whose resident
    memory is O(batch), not O(dataset) — required at LibriMix scale."""
    if lazy:
        n = _wav_duration_samples(utt.wav_path, dc.sampling_rate)
        wav_norm = None
    else:
        wav_data, sr = read_wav(utt.wav_path)
        wav_data = resample(wav_data, sr, dc.sampling_rate)
        n = len(wav_data)
        wav_norm = normalize_waveform(wav_data)
    if not (dc.min_duration_in_seconds * dc.sampling_rate < n
            < dc.max_duration_in_seconds * dc.sampling_rate):
        return None
    text = utt.text.lower() if dc.do_lower_case else utt.text
    if instruct:
        prompt = utt.prompt.lower() if dc.do_lower_case else utt.prompt
        prompt_str, input_str = build_prompt_and_input(prompt, text)
        labels = tokenizer.encode(prompt_str + input_str, add_bos=False)
        prompt_ids = tokenizer.encode(prompt_str, add_bos=False)
    else:
        labels = tokenizer.encode(text, add_bos=False)
        prompt_ids = []
    return PreparedExample(utt.utt_id, wav_norm, labels, prompt_ids, n,
                           wav_path=utt.wav_path if lazy else None)


# module-level worker state so multiprocessing can pickle the worker fn;
# populated in each worker by the Pool initializer (spawn-safe: module
# globals set in the parent do not survive a spawn start)
_PREP_CTX: dict = {}


def _prep_init(tokenizer, dc, instruct, lazy):
    _PREP_CTX.update(tokenizer=tokenizer, dc=dc, instruct=instruct,
                     lazy=lazy)


def _prep_worker(utt):
    return prepare_example(utt, _PREP_CTX["tokenizer"], _PREP_CTX["dc"],
                           _PREP_CTX["instruct"], lazy=_PREP_CTX["lazy"])


def _cache_fingerprint(tokenizer, dc: DataConfig, instruct: bool) -> dict:
    """Settings that change prepared labels/durations — a cache written
    under one config must not be served under another (ADVICE r2)."""
    tok_id = (getattr(tokenizer, "name_or_path", None)
              or type(tokenizer).__name__)
    return {
        "tokenizer": str(tok_id),
        "vocab_size": int(getattr(tokenizer, "vocab_size", 0) or 0),
        "sampling_rate": dc.sampling_rate,
        "min_duration_in_seconds": dc.min_duration_in_seconds,
        "max_duration_in_seconds": dc.max_duration_in_seconds,
        "do_lower_case": dc.do_lower_case,
        "instruct": bool(instruct),
    }


def prepare_examples(
    utts: Sequence[Utterance], tokenizer, dc: DataConfig,
    instruct: bool = False, *, lazy: bool = True, num_proc: int = 1,
    cache_path: Optional[str] = None,
) -> List[PreparedExample]:
    """Batch preprocessing with optional worker pool and on-disk cache —
    the reference's datasets.map(num_proc=...) + arrow cache pattern
    (finetune_asr.py:147-154, vectorized_dataset_utils.py:26-124)."""
    import json
    import logging
    import os
    fp = _cache_fingerprint(tokenizer, dc, instruct)
    if cache_path and os.path.exists(cache_path):
        out = []
        stale = False
        with open(cache_path) as f:
            header = json.loads(f.readline() or "{}")
            if header.get("__fingerprint__") != fp:
                stale = True  # old-format or different config: rebuild
            else:
                for line in f:
                    d = json.loads(line)
                    out.append(PreparedExample(
                        d["utt_id"], None, d["labels"], d["prompt_ids"],
                        d["n_samples"], wav_path=d["wav_path"]))
        if not stale:
            return out
        logging.getLogger("mtasr_tpu.data").warning(
            "preprocessing cache %s was written under a different "
            "tokenizer/data config; rebuilding", cache_path)

    if num_proc > 1:
        import multiprocessing as mp
        # spawn, not fork: the CLIs initialize JAX (multithreaded) before
        # preprocessing, and forking a threaded process can deadlock
        # (ADVICE r2). Worker state travels via the initializer.
        ctx = mp.get_context("spawn")
        with ctx.Pool(num_proc, initializer=_prep_init,
                      initargs=(tokenizer, dc, instruct, lazy)) as pool:
            prepared = pool.map(_prep_worker, list(utts), chunksize=64)
    else:
        prepared = [prepare_example(u, tokenizer, dc, instruct, lazy=lazy)
                    for u in utts]
    out = [e for e in prepared if e is not None]

    if cache_path and lazy:
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"__fingerprint__": fp}) + "\n")
            for e in out:
                f.write(json.dumps({
                    "utt_id": e.utt_id, "labels": list(map(int, e.labels)),
                    "prompt_ids": list(map(int, e.prompt_ids)),
                    "n_samples": int(e.n_samples),
                    "wav_path": e.wav_path}) + "\n")
        os.replace(tmp, cache_path)
    return out


def bucket_length(n_samples: int, dc: DataConfig) -> int:
    for b in dc.bucket_boundaries_seconds:
        cap = int(b * dc.sampling_rate)
        if n_samples <= cap:
            return cap
    return int(dc.bucket_boundaries_seconds[-1] * dc.sampling_rate)


@dataclass
class Batch:
    """Static-shape arrays ready for the jitted train/eval step."""
    utt_ids: List[str]
    arrays: Dict[str, np.ndarray]
    splice_index: int


def collate(examples: Sequence[PreparedExample],
            cfg: SpeechEncoderDecoderConfig, dc: DataConfig,
            *, training: bool = True,
            label_pad_to: Optional[int] = None,
            spec_augment_rng: Optional[np.random.Generator] = None) -> Batch:
    B = len(examples)
    S = bucket_length(max(e.n_samples for e in examples), dc)
    wav_batch = np.zeros((B, S), np.float32)
    amask = np.zeros((B, S), np.int32)
    # native fast path: decode+normalize the batch's lazy WAVs in parallel
    # straight into wav_batch (native/audio_loader.cpp). Rows the native
    # loader can't serve exactly (needs resampling, exotic encoding, or
    # longer than the bucket — Python normalizes over the FULL waveform
    # before clipping) fall back to the Python reader below.
    native_rows = [i for i, e in enumerate(examples)
                   if e.input_values is None and e.wav_path is not None
                   and e.n_samples <= S]
    loaded = set()
    if native_rows:
        from mtasr_tpu.utils.native import wav_load_batch_native
        sub = wav_batch[native_rows] if len(native_rows) < B else wav_batch
        res = wav_load_batch_native(
            [examples[i].wav_path for i in native_rows], sub,
            dc.sampling_rate)
        if res is not None:
            lens, status = res
            for j, i in enumerate(native_rows):
                if status[j] == 0:
                    amask[i, :lens[j]] = 1
                    loaded.add(i)
            if len(native_rows) < B and loaded:
                wav_batch[native_rows] = sub
    for i, e in enumerate(examples):
        if i in loaded:
            continue
        w = e.waveform(dc)            # lazy examples load from disk here
        ln = min(len(w), S)
        wav_batch[i, :ln] = w[:ln]
        amask[i, :ln] = 1

    arrays: Dict[str, np.ndarray] = {
        "input_values": wav_batch, "audio_mask": amask,
    }
    # label surgery runs for eval batches too (teacher-forced eval loss) —
    # but a decode-only batch (no row has labels, e.g. the Transcriber API)
    # carries no label arrays at all: `generate` doesn't read them, and the
    # strict <sc>-count validation would (rightly) reject empty SOT labels
    has_labels = any(len(e.labels) > 0 for e in examples)
    if has_labels or training:
        L = label_pad_to or max(len(e.labels) for e in examples)
        raw_labels = np.full((B, L), -100, np.int64)
        for i, e in enumerate(examples):
            raw_labels[i, :min(len(e.labels), L)] = e.labels[:L]
        surgery = build_training_arrays(
            raw_labels, pad_token_id=cfg.pad_token_id,
            decoder_start_token_id=cfg.decoder_start_token_id,
            eos_token_id=cfg.eos_token_id, sc_token_id=cfg.sc_token_id,
            talker_numbers=cfg.talker_numbers, instruct=cfg.instruct,
            eosr_token_id=cfg.eosr_token_id, bosp_token_id=cfg.bosp_token_id,
            eosp_token_id=cfg.eosp_token_id, bosr_token_id=cfg.bosr_token_id,
            label_spk_pad_to=label_pad_to, split_speakers=cfg.talker_ctc)
        splice_index = surgery.pop("splice_index")
        arrays.update({k: np.asarray(v) for k, v in surgery.items()})
    else:
        splice_index = 1

    if cfg.instruct:
        P = max(len(e.prompt_ids) for e in examples)
        prompt_ids = np.full((B, P), cfg.pad_token_id, np.int64)
        for i, e in enumerate(examples):
            prompt_ids[i, :len(e.prompt_ids)] = e.prompt_ids
        arrays["prompt_ids"] = prompt_ids

    if (training and cfg.encoder.apply_spec_augment
            and cfg.encoder.mask_time_prob > 0):
        T0 = cfg.encoder.conv_output_length(S)
        feat_lens = np.asarray(
            [cfg.encoder.conv_output_length(min(e.n_samples, S))
             for e in examples])
        feat_mask = (np.arange(T0)[None, :] < feat_lens[:, None]).astype(int)
        arrays["mask_time_indices"] = compute_mask_indices(
            (B, T0), cfg.encoder.mask_time_prob, cfg.encoder.mask_time_length,
            attention_mask=feat_mask,
            min_masks=cfg.encoder.mask_time_min_masks, rng=spec_augment_rng)

    return Batch(utt_ids=[e.utt_id for e in examples], arrays=arrays,
                 splice_index=splice_index)


def batches_from_examples(
    examples: List[PreparedExample], cfg: SpeechEncoderDecoderConfig,
    dc: DataConfig, batch_size: int, *,
    training: bool = True, shuffle: bool = True, seed: int = 0,
    drop_last: bool = True, pad_partial: bool = False,
    shard_index: int = 0, num_shards: int = 1,
) -> Iterator[Batch]:
    """Length-bucketed batch iterator with host-level dataset sharding
    (reference inference_asr_gpus.py:200-202 dataset.shard pattern).

    pad_partial=True tops up a short final chunk by cycling examples from
    the same bucket — torch DistributedSampler's drop_last=False padding,
    which the reference's DDP launch relies on so a global batch (bs x
    world_size) larger than a small dataset still trains. Keeps every batch
    at the full static shape.
    """
    rng = np.random.default_rng(seed)
    examples = examples[shard_index::num_shards]
    # group by (audio bucket, prompt length) so every batch has one static
    # audio shape AND one prompt layout — batched decode splices speech at
    # a single prompt position, so mixing prompt lengths in one batch would
    # mis-splice the shorter rows (the reference avoids this by decoding
    # per-sample, inference_asr.py:171-217)
    by_bucket: Dict[tuple, List[PreparedExample]] = {}
    for e in examples:
        key = (bucket_length(e.n_samples, dc), len(e.prompt_ids))
        by_bucket.setdefault(key, []).append(e)
    order = []
    for bucket, group in sorted(by_bucket.items()):
        idx = np.arange(len(group))
        if shuffle:
            rng.shuffle(idx)
        lo_stop = (len(group) if (not drop_last or pad_partial)
                   else len(group) - (batch_size - 1))
        for i in range(0, max(lo_stop, 0), batch_size):
            chunk = [group[j] for j in idx[i:i + batch_size]]
            if len(chunk) < batch_size:
                if drop_last and not pad_partial:
                    continue
                if pad_partial:
                    k = 0
                    while len(chunk) < batch_size:
                        chunk.append(group[idx[k % len(group)]])
                        k += 1
            order.append(chunk)
    if shuffle:
        rng.shuffle(order)
    for chunk in order:
        yield collate(chunk, cfg, dc, training=training,
                      label_pad_to=dc.max_label_length,
                      spec_augment_rng=rng)
