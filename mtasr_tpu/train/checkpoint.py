"""Checkpointing: orbax-backed save/restore with auto-resume, retention,
prefix-filtered partial restore, and safetensors export.

Reference equivalents:
* auto-resume + refuse-to-clobber  -- utils/checkpoint_checking_utils.py:31-66
* save_steps/save_total_limit      -- run.sh:217-220 (HF Trainer retention)
* compositional checkpointing      -- utils/extract_sep_ctc.py,
  encoder_extract.py (filter state_dict by key prefix) and
  utils/load_sep_ctc_from_partial.py (re-inject separator+CTC into a fresh
  model, tolerating ctc_lo vocab-size mismatch by copying min(V) rows)
* safetensors export w/ format=pt  -- utils/fix_safetensors_metadata.py
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

import orbax.checkpoint as ocp


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")


# One process-wide AsyncCheckpointer: orbax copies device arrays to host
# synchronously inside save() (so donated/overwritten buffers are safe) and
# serializes/writes in a background thread — training resumes while the
# checkpoint lands on disk. The reference's HF Trainer saves synchronously,
# stalling every save_steps; at flagship scale (params + AdamW moments)
# that is seconds per save. save() itself waits for any previous pending
# save, so back-to-back saves can never interleave.
_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_pending_saves() -> None:
    """Block until any in-flight async checkpoint write has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(output_dir: str, step: int, params, opt_state=None,
                    extra: Optional[dict] = None,
                    save_total_limit: Optional[int] = None,
                    blocking: bool = False) -> str:
    """Write checkpoint-<step>. blocking=False (default) returns as soon as
    the device->host copy is done and commits the write in the background;
    restore_checkpoint/last_checkpoint drain pending writes first, so
    readers never observe a partial checkpoint from this process."""
    path = _ckpt_dir(output_dir, step)
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if extra is not None:
        tree["extra"] = extra
    ckptr = _async_ckptr()
    ckptr.wait_until_finished()      # serialize with any previous save
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, args=ocp.args.StandardSave(tree))
    if blocking:
        ckptr.wait_until_finished()
    if save_total_limit:
        # retention only ever deletes checkpoints OLDER than the in-flight
        # one (counted explicitly via `step`: the async write lands in a
        # tmp dir and renames on commit, so a directory listing may not
        # see it yet), so it cannot race the pending write
        _apply_retention(output_dir, save_total_limit, in_flight=step)
    return path


def _apply_retention(output_dir: str, limit: int,
                     in_flight: Optional[int] = None) -> None:
    # non-draining listing + the (possibly still-writing) in-flight step:
    # composes with an async save without forcing it to finish
    steps = set(_list_checkpoints_nosync(output_dir))
    if in_flight is not None:
        steps.add(in_flight)
    for s in sorted(steps)[:-limit]:
        if s != in_flight:
            shutil.rmtree(_ckpt_dir(output_dir, s), ignore_errors=True)


def _list_checkpoints_nosync(output_dir: str) -> List[int]:
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def list_checkpoints(output_dir: str) -> List[int]:
    # drain in-flight writes so a just-saved checkpoint is never listed
    # (and then resumed from) half-written
    wait_for_pending_saves()
    return _list_checkpoints_nosync(output_dir)


def last_checkpoint(output_dir: str) -> Optional[str]:
    steps = list_checkpoints(output_dir)
    return _ckpt_dir(output_dir, steps[-1]) if steps else None


def resume_or_raise(output_dir: str, overwrite: bool = False,
                    resume: bool = True) -> Optional[str]:
    """Reference semantics (checkpoint_checking_utils.py:31-66): refuse to
    clobber a non-empty output dir unless it contains checkpoints to resume
    from or overwrite is set."""
    if not os.path.isdir(output_dir):
        return None
    ckpt = last_checkpoint(output_dir)
    if ckpt is None:
        if os.listdir(output_dir) and not overwrite:
            raise ValueError(
                f"Output directory ({output_dir}) is non-empty with no "
                "checkpoint. Pass overwrite=True to train from scratch.")
        return None
    return ckpt if resume else None


def restore_checkpoint(path: str, template: dict):
    """template: {'params': ..., ['opt_state': ...], ['extra': ...]} with
    abstract or concrete arrays defining structure/sharding."""
    wait_for_pending_saves()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)


# ---------------------------------------------------------------------------
# compositional checkpointing
# ---------------------------------------------------------------------------
def extract_by_prefix(params: dict, prefixes: Tuple[str, ...]) -> dict:
    """Keep only top-level subtrees named in `prefixes`
    (reference extract_sep_ctc.py filters 'separator.'/'serialized_ctc.')."""
    return {k: v for k, v in params.items() if k in prefixes}


def load_partial(params: dict, donor: dict, prefixes: Tuple[str, ...],
                 vocab_tolerant_keys: Tuple[str, ...] = ("ctc_lo",)) -> dict:
    """Graft donor subtrees into params (load_sep_ctc_from_partial.py:54-117).
    For ctc_lo weights with mismatched vocab rows, copy min(V) rows and keep
    the remainder from params (reference lines 8-51)."""
    out = dict(params)
    for pref in prefixes:
        if pref not in donor:
            continue
        if pref not in out:
            out[pref] = donor[pref]
            continue
        out[pref] = _merge(out[pref], donor[pref], vocab_tolerant_keys)
    return out


def _merge(dst, src, tolerant_keys, path=""):
    if isinstance(dst, dict) and isinstance(src, dict):
        merged = dict(dst)
        for k in src:
            if k in dst:
                merged[k] = _merge(dst[k], src[k], tolerant_keys,
                                   f"{path}/{k}")
            else:
                merged[k] = src[k]
        return merged
    d, s = np.asarray(dst), np.asarray(src)
    if d.shape == s.shape:
        return src
    if any(t in path for t in tolerant_keys) and d.ndim == s.ndim:
        # vocab-size-tolerant: copy overlapping rows (reference behavior)
        sl = tuple(slice(0, min(a, b)) for a, b in zip(d.shape, s.shape))
        d = d.copy()
        d[sl] = s[sl]
        import jax.numpy as jnp
        return jnp.asarray(d)
    raise ValueError(f"shape mismatch at {path}: {d.shape} vs {s.shape}")
