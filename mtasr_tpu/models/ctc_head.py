"""Per-speaker CTC head: projection to vocab+blank + loss/inference helpers.

Re-design of /root/reference/models/ctc.py (ESPnet-style CTC wrapping
torch.nn.CTCLoss). `odim = decoder_vocab_size + 1`, `blank = odim - 1`
(modeling_speech_encoder_decoder_llama.py:187-193). The loss is our Pallas/XLA
CTC (ops/ctc.py) with the same semantics: float32 log-softmax,
reduction='none', zero_infinity, batch-size averaging done by the caller.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mtasr_tpu.models.layers import linear, linear_init
from mtasr_tpu.ops.ctc import ctc_loss


def init_ctc_params(key: jax.Array, encoder_output_size: int, odim: int,
                    dtype=jnp.float32) -> dict:
    return {"ctc_lo": linear_init(key, encoder_output_size, odim, dtype=dtype)}


def ctc_logits(params: dict, hs: jax.Array) -> jax.Array:
    return linear(params["ctc_lo"], hs)


def ctc_log_softmax(params: dict, hs: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(ctc_logits(params, hs).astype(jnp.float32), -1)


def ctc_argmax(params: dict, hs: jax.Array) -> jax.Array:
    return jnp.argmax(ctc_logits(params, hs), axis=-1)


def ctc_head_loss(params: dict, hs: jax.Array, hlens: jax.Array,
                  ys: jax.Array, ylens: jax.Array, blank_id: int,
                  fused: bool = True) -> jax.Array:
    """Per-sample loss [B] (reference CTC.forward + loss_fn with
    reduction='none'; ctc.py:51-65,129-160).

    fused=True (default) uses the time-chunked custom-VJP path that never
    materializes the [B, T, vocab+1] logits — required to train the
    flagship (128k-vocab heads) on a single 16 GB chip (ops/ctc_fused.py)."""
    if fused:
        from mtasr_tpu.ops.ctc_fused import ctc_loss_from_hidden
        w = params["ctc_lo"]["weight"]
        b = params["ctc_lo"].get("bias",
                                 jnp.zeros((w.shape[0],), w.dtype))
        return ctc_loss_from_hidden(hs, w, b, hlens, ys, ylens, blank_id)
    logits = ctc_logits(params, hs).astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return ctc_loss(log_probs, hlens, ys, ylens, blank_id)
