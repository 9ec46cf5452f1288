"""Assembly-path test with REAL HF checkpoint formats: save small random
WavLM + LLaMA with transformers' save_pretrained, assemble the composite via
our CLI path, and verify the loaded weights numerically match the originals
through our forward."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_dirs(tmp_path_factory):
    from transformers import (
        LlamaConfig as HFLlama, LlamaForCausalLM, WavLMConfig as HFWavLM,
        WavLMModel,
    )
    root = tmp_path_factory.mktemp("hf")
    torch.manual_seed(0)
    wavlm = WavLMModel(HFWavLM(
        vocab_size=32, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=72,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_feat_extract_layers=2, conv_bias=True, num_buckets=32,
        max_bucket_distance=50, do_stable_layer_norm=True,
        feat_extract_norm="layer", num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, add_adapter=False,
        mask_time_prob=0.05))
    wavlm.save_pretrained(root / "wavlm", safe_serialization=True)
    llama = LlamaForCausalLM(HFLlama(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, bos_token_id=1, eos_token_id=2))
    llama.save_pretrained(root / "llama", safe_serialization=True)
    return str(root / "wavlm"), str(root / "llama")


def test_create_from_pretrained_dirs(hf_dirs, tmp_path):
    from mtasr_tpu.utils.model_io import create_from_pretrained, load_model, save_model

    enc_dir, dec_dir = hf_dirs
    special_ids = {"pad_token_id": 130, "sc_token_id": 131, "instruct": False}
    cfg, params = create_from_pretrained(
        enc_dir, dec_dir, tokenizer_len=132, special_ids=special_ids,
        model_overrides=dict(talker_ctc=True, talker_numbers=2,
                             separator_hidden=24, train_mode="hybrid"))
    # config surgery applied
    assert cfg.encoder.add_adapter is True
    assert cfg.encoder.mask_time_prob == 0.1
    assert cfg.decoder.vocab_size == 132
    assert cfg.pad_token_id == 130

    # pretrained decoder weights grafted (not re-initialized)
    from safetensors.numpy import load_file
    hf_flat = load_file(os.path.join(dec_dir, "model.safetensors"))
    got = np.asarray(
        params["decoder"]["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"])
    np.testing.assert_allclose(
        got, hf_flat["model.layers.0.self_attn.q_proj.weight"], rtol=1e-6)
    # embeddings resized: first 128 rows match, 4 new rows exist
    emb = np.asarray(params["decoder"]["model"]["embed_tokens"]["weight"])
    assert emb.shape[0] == 132
    np.testing.assert_allclose(emb[:128], hf_flat["model.embed_tokens.weight"],
                               rtol=1e-6)

    # encoder weights grafted
    hf_enc = load_file(os.path.join(enc_dir, "model.safetensors"))
    got_e = np.asarray(
        params["encoder"]["feature_projection"]["projection"]["weight"])
    np.testing.assert_allclose(
        got_e, hf_enc["feature_projection.projection.weight"], rtol=1e-6)
    # adapter was ADDED (not in the pretrained encoder) -> fresh init exists
    assert "adapter" in params["encoder"]

    # save/load roundtrip + a forward through the assembled model
    out_dir = str(tmp_path / "composite")
    save_model(out_dir, cfg, params)
    cfg2, params2 = load_model(out_dir)
    assert cfg2.decoder.vocab_size == 132

    from mtasr_tpu.models.speech_encoder_decoder import model_forward
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 100, (2, 6)), jnp.int32)
    out = model_forward(params2, cfg2, wav, jnp.ones((2, 8000), jnp.int32),
                        ids, splice_index=1)
    assert np.all(np.isfinite(np.asarray(out.logits)))
