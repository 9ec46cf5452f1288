"""High-level Transcriber API (mtasr_tpu/api.py): one-call batched
transcription over the production generate/engine paths."""
import numpy as np
import pytest

import jax

from mtasr_tpu.api import Transcriber
from mtasr_tpu.config import DataConfig, GenerationConfig
from mtasr_tpu.data.audio import write_wav
from mtasr_tpu.data.tokenizer import CharTokenizer
from mtasr_tpu.models.speech_encoder_decoder import init_model_params

from tests.test_composite import tiny_cfg


def _transcriber(train_mode="attention", talker_ctc=False, instruct=False):
    cfg = tiny_cfg(train_mode=train_mode, talker_ctc=talker_ctc)
    tok = CharTokenizer()
    sp = tok.add_special_tokens(instruct=instruct)
    cfg.pad_token_id = sp.pad_token_id
    cfg.sc_token_id = sp.sc_token_id
    if instruct:
        cfg.instruct = True
        cfg.bosp_token_id = sp.bosp_token_id
        cfg.eosp_token_id = sp.eosp_token_id
        cfg.boss_token_id = sp.boss_token_id
        cfg.eoss_token_id = sp.eoss_token_id
        cfg.bosr_token_id = sp.bosr_token_id
        cfg.eosr_token_id = sp.eosr_token_id
    params = init_model_params(jax.random.key(0), cfg)
    return Transcriber(cfg, params, tok,
                       gen=GenerationConfig(do_sample=False))


def test_transcribe_arrays_and_paths_equivalent(tmp_path):
    """The same audio given as a waveform array and as a wav path decodes
    to the same text (paths go through the lazy loader)."""
    t = _transcriber()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav)
    # write_wav round-trips through PCM16; read the quantized version back
    # so both inputs are numerically identical
    from mtasr_tpu.data.audio import read_wav
    wav_q, _ = read_wav(p)
    out = t.transcribe([wav_q, p], max_new_tokens=6, batch_size=2)
    assert len(out) == 2
    assert out[0] == out[1]


def test_transcribe_preserves_input_order(tmp_path):
    """Mixed lengths land in different duration buckets (batched out of
    order); results must still come back in input order."""
    t = _transcriber()
    rng = np.random.default_rng(1)
    short = (rng.standard_normal(3000) * 0.2).astype(np.float32)
    long = (rng.standard_normal(12000) * 0.2).astype(np.float32)
    # order: long, short, long -> buckets reorder internally
    o1 = t.transcribe([long, short, long], max_new_tokens=5, batch_size=2)
    o2_short = t.transcribe([short], max_new_tokens=5)
    o2_long = t.transcribe([long], max_new_tokens=5)
    assert o1 == [o2_long[0], o2_short[0], o2_long[0]]


def test_transcribe_extends_bucket_ladder():
    """Inputs longer than the last duration bucket are not clipped."""
    t = _transcriber()
    t.dc = DataConfig(min_duration_in_seconds=0.0,
                      max_duration_in_seconds=1e9,
                      bucket_boundaries_seconds=(0.1,))
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(8000) * 0.2).astype(np.float32)  # 0.5 s
    short = wav[:1500]                                          # ~0.09 s
    # the long row must decode like a standalone un-clipped decode
    got = t.transcribe([wav, short], max_new_tokens=5)
    alone = t.transcribe([wav], max_new_tokens=5)
    assert got[0] == alone[0]


def test_transcribe_ctc_streams():
    t = _transcriber(train_mode="hybrid", talker_ctc=True)
    rng = np.random.default_rng(3)
    wavs = [(rng.standard_normal(4000) * 0.2).astype(np.float32)
            for _ in range(3)]
    out = t.transcribe_ctc(wavs, max_out_len=8)
    assert len(out) == 3
    assert all(len(streams) == t.cfg.talker_numbers for streams in out)
    assert all(isinstance(s, str) for streams in out for s in streams)
    # ctc guard on a no-CTC model
    t2 = _transcriber()
    with pytest.raises(ValueError):
        t2.transcribe_ctc(wavs)


def test_transcribe_instruct_prompt():
    t = _transcriber(instruct=True)
    rng = np.random.default_rng(4)
    wav = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    out = t.transcribe([wav], prompt="transcribe both speakers",
                       max_new_tokens=5)
    assert len(out) == 1 and isinstance(out[0], str)


def test_transcribe_num_beams():
    """num_beams=1 equals the default greedy route; num_beams=4 runs the
    beam engine and returns one (best-beam) transcript per input."""
    t = _transcriber()
    rng = np.random.default_rng(5)
    wavs = [(rng.standard_normal(4000) * 0.2).astype(np.float32)
            for _ in range(2)]
    greedy = t.transcribe(wavs, max_new_tokens=6, batch_size=2)
    b1 = t.transcribe(wavs, max_new_tokens=6, batch_size=2, num_beams=1)
    assert b1 == greedy
    b4 = t.transcribe(wavs, max_new_tokens=6, batch_size=2, num_beams=4)
    assert len(b4) == 2 and all(isinstance(s, str) for s in b4)
