"""Config-combination validation: loud init-time errors instead of
None-crashes deep in the forward (VERDICT.md round 1, weak #6). The
reference hard-wires switches at module construction
(modeling...llama.py:204-289) and crashes unintelligibly on bad combos."""
import pytest

import jax

from mtasr_tpu.models.speech_encoder_decoder import init_model_params
from tests.test_composite import tiny_cfg


@pytest.mark.parametrize("kw,frag", [
    (dict(ctc_bridge=True, talker_ctc=False), "talker_ctc"),
    (dict(train_mode="hybrid", talker_ctc=False), "talker_ctc"),
    (dict(train_mode="ctc", talker_ctc=False), "talker_ctc"),
    (dict(talker_ctc_refine=True, talker_ctc=False), "talker_ctc"),
    (dict(decoder_cross_attention=True,
          decoder_cross_attention_feature="sep", talker_ctc=False),
     "talker_ctc"),
    (dict(decoder_cross_attention=True,
          decoder_cross_attention_type="ctcaware", talker_ctc=False),
     "talker_ctc"),
    (dict(train_mode="bogus"), "train_mode"),
    (dict(ctc_bridge=True, talker_ctc=True, ctc_bridge_type="nope"),
     "ctc_bridge_type"),
    (dict(talker_ctc=True, talker_numbers=1), "talker_numbers"),
])
def test_invalid_combos_raise(kw, frag):
    cfg = tiny_cfg(**kw)
    with pytest.raises(ValueError, match=frag):
        init_model_params(jax.random.key(0), cfg)


def test_valid_combos_pass():
    for kw in (dict(train_mode="attention", talker_ctc=False),
               dict(train_mode="hybrid", talker_ctc=True),
               dict(train_mode="ctc", talker_ctc=True),
               dict(ctc_bridge=True, ctc_bridge_type="ctcprompt",
                    talker_ctc=True, train_mode="hybrid")):
        cfg = tiny_cfg(**kw)
        cfg.validate()


def test_instruct_requires_special_ids():
    cfg = tiny_cfg(train_mode="attention", talker_ctc=False, instruct=True,
                   bosp_token_id=52, eosp_token_id=53, boss_token_id=54,
                   eoss_token_id=55, bosr_token_id=56, eosr_token_id=57)
    cfg.validate()  # ids fit in VOCAB=64
    cfg.eosr_token_id = 10_000  # beyond vocab
    with pytest.raises(ValueError, match="vocab"):
        cfg.validate()


def test_inference_cli_flag_guards():
    """Incompatible decode-flag combinations fail loudly, not silently."""
    import pytest
    from mtasr_tpu.cli.inference_asr import main as infer_main
    base = ["--model_name_or_path", "/nonexistent", "--data_dir", "/n",
            "--output_dir", "/tmp/x"]
    with pytest.raises(SystemExit):
        infer_main(base + ["--pipelined", "--num_beams", "4"])
    with pytest.raises(SystemExit):
        infer_main(base + ["--num_beams", "4", "--speculative", "ctc"])
    with pytest.raises(SystemExit):
        infer_main(base + ["--num_beams", "4", "--do_sample"])
