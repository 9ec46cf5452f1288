"""Trainer evaluate() with generation-WER, and sharded-params generation on
the virtual mesh."""
import numpy as np

import jax
import jax.numpy as jnp

from mtasr_tpu.config import DataConfig, GenerationConfig, TrainingConfig
from mtasr_tpu.data.pipeline import Batch, collate, prepare_example
from mtasr_tpu.data.audio import Utterance, write_wav
from mtasr_tpu.data.tokenizer import CharTokenizer
from mtasr_tpu.models.speech_encoder_decoder import init_model_params
from mtasr_tpu.train.loop import Trainer
from tests.test_composite import make_batch, tiny_cfg


def test_trainer_evaluate_with_wer(tmp_path):
    cfg = tiny_cfg(train_mode="hybrid", talker_ctc=True)
    tok = CharTokenizer()
    sp = tok.add_special_tokens()
    cfg.pad_token_id, cfg.sc_token_id = sp.pad_token_id, sp.sc_token_id
    params = init_model_params(jax.random.key(0), cfg)
    tc = TrainingConfig(output_dir=str(tmp_path / "exp"), max_steps=1,
                        pcgrad=False)
    dc = DataConfig(max_duration_in_seconds=2.0, min_duration_in_seconds=0.01)

    rng = np.random.default_rng(0)
    utts, refs = [], {}
    for i, text in enumerate(["hi you<sc>go now", "ab cd<sc>ef gh"]):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, rng.standard_normal(8000) * 0.1)
        utts.append(Utterance(f"u{i}", p, text))
        refs[f"u{i}"] = text
    examples = [prepare_example(u, tok, dc) for u in utts]
    batch = collate(examples, cfg, dc, training=False, label_pad_to=32)

    trainer = Trainer(cfg, tc, dc, params, tokenizer=tok,
                      freeze_kwargs={"train_all": True},
                      gen_cfg=GenerationConfig(max_length=8))
    metrics = trainer.evaluate([batch], refs)
    assert np.isfinite(metrics["eval_loss"])
    assert 0 <= metrics["eval_wer"] <= 300  # random model: high WER, bounded


def test_generate_with_sharded_params():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mtasr_tpu.generate import generate
    from mtasr_tpu.parallel.mesh import make_mesh, shard_params

    cfg = tiny_cfg(train_mode="attention")
    params = init_model_params(jax.random.key(1), cfg)
    mesh = make_mesh(dp_size=4, tp_size=2)
    params_sh = shard_params(params, mesh)
    wav, amask, _ = make_batch(cfg, B=4, seed=6)
    wav_sh = jax.device_put(jnp.asarray(wav), NamedSharding(mesh, P("data")))
    amask_sh = jax.device_put(jnp.asarray(amask), NamedSharding(mesh, P("data")))
    with mesh:
        out = generate(params_sh, cfg, wav_sh, amask_sh, max_new_tokens=4)
    # matches unsharded decode
    ref = generate(params, cfg, jnp.asarray(wav), jnp.asarray(amask),
                   max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(out.sequences),
                                  np.asarray(ref.sequences))
