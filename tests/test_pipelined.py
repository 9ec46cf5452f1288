"""Pipelined batch-stream decode (generate/pipelined.py): encode of batch
i+1 interleaved into the decode loop of batch i must be TOKEN-IDENTICAL to
sequential `generate` per batch — the interleave may only change wall-clock,
never outputs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.config import GenerationConfig
from mtasr_tpu.generate import generate
from mtasr_tpu.generate.pipelined import generate_pipelined
from mtasr_tpu.models.speech_encoder_decoder import init_model_params
from tests.test_composite import make_batch, tiny_cfg


def _stream(cfg, n_batches=3, B=2):
    batches = []
    for i in range(n_batches):
        wav, amask, _ = make_batch(cfg, B=B, seed=10 + i)
        batches.append({"input_values": jnp.asarray(wav),
                        "audio_mask": jnp.asarray(amask)})
    return batches


@pytest.mark.parametrize("mode,n_layers", [("attention", 3), ("hybrid", 1)])
def test_pipelined_token_identity(mode, n_layers):
    """n_layers=3 exercises the slot interleave (2 stacked layers);
    n_layers=1 exercises the n_rest=0 degenerate path (tail-only)."""
    cfg = tiny_cfg(train_mode=mode, talker_ctc=(mode != "attention"))
    cfg.encoder.num_hidden_layers = n_layers
    params = init_model_params(jax.random.key(0), cfg)
    batches = _stream(cfg)
    outs = generate_pipelined(params, cfg, batches, max_new_tokens=8)
    assert len(outs) == len(batches)
    for i, b in enumerate(batches):
        ref = generate(params, cfg, b["input_values"], b["audio_mask"],
                       max_new_tokens=8)
        np.testing.assert_array_equal(np.asarray(outs[i].sequences),
                                      np.asarray(ref.sequences)), i
        np.testing.assert_array_equal(np.asarray(outs[i].lengths),
                                      np.asarray(ref.lengths))


def test_pipelined_short_decode_overrun_safe():
    """max_new_tokens < number of stacked layers: every slot's decode step
    beyond max_new is an overrun no-op; outputs must still match."""
    cfg = tiny_cfg(train_mode="attention", talker_ctc=False)
    cfg.encoder.num_hidden_layers = 4   # n_rest=3 > max_new-1=2
    params = init_model_params(jax.random.key(1), cfg)
    batches = _stream(cfg, n_batches=2)
    outs = generate_pipelined(params, cfg, batches, max_new_tokens=3)
    for i, b in enumerate(batches):
        ref = generate(params, cfg, b["input_values"], b["audio_mask"],
                       max_new_tokens=3)
        np.testing.assert_array_equal(np.asarray(outs[i].sequences),
                                      np.asarray(ref.sequences))


def test_pipelined_ctc_bridge_mode():
    """The bridge/adapter/separator tail (_post_encode) must reproduce
    encode_speech for a nontrivial bridge config."""
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True,
                   ctc_bridge=True, ctc_bridge_type="softmax")
    params = init_model_params(jax.random.key(2), cfg)
    batches = _stream(cfg, n_batches=2)
    outs = generate_pipelined(params, cfg, batches, max_new_tokens=6)
    for i, b in enumerate(batches):
        ref = generate(params, cfg, b["input_values"], b["audio_mask"],
                       max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(outs[i].sequences),
                                      np.asarray(ref.sequences))
