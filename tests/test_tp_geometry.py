"""Tensor-parallel sharding on real model geometries: verify the partition
rules actually shard the big projections (not fall back to replication) and
that the sharded forward matches single-device."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mtasr_tpu.config import llama_8b_config
from mtasr_tpu.models.llama import embed_tokens, init_llama_params, llama_forward
from mtasr_tpu.parallel.mesh import make_mesh, shard_params, spec_for_path


def test_partition_rules_hit_expected_params():
    assert spec_for_path("decoder/model/layers/0/self_attn/q_proj/weight") \
        == P("model", None)
    assert spec_for_path("decoder/model/layers/7/self_attn/o_proj/weight") \
        == P(None, "model")
    assert spec_for_path("decoder/model/layers/0/mlp/down_proj/weight") \
        == P(None, "model")
    assert spec_for_path("decoder/model/embed_tokens/weight") == P("model", None)
    assert spec_for_path("decoder/lm_head/weight") == P("model", None)
    assert spec_for_path("serialized_ctc/0/ctc_lo/weight") == P("model", None)
    assert spec_for_path("decoder/model/norm/weight") == P()
    assert spec_for_path("encoder/encoder/layers/3/attention/q_proj/weight") \
        == P("model", None)


def test_8b_geometry_sharded_forward_matches():
    # 8B dims (4096 hidden, 14336 mlp), 2 layers for speed, small vocab
    cfg = llama_8b_config(num_hidden_layers=2, vocab_size=1024)
    params = {"decoder": init_llama_params(jax.random.key(0), cfg)}
    mesh = make_mesh(dp_size=4, tp_size=2)
    params_sh = shard_params(params, mesh)

    # the big projections must actually be sharded over 'model'
    q_sh = params_sh["decoder"]["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"].sharding
    assert q_sh.spec == P("model", None), q_sh
    down_sh = params_sh["decoder"]["model"]["layers"]["0"]["mlp"]["down_proj"]["weight"].sharding
    assert down_sh.spec == P(None, "model"), down_sh

    rng = np.random.default_rng(0)
    B, L = 4, 9
    ids = rng.integers(0, 1024, (B, L))
    pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))

    ref_logits, _ = llama_forward(
        params["decoder"], cfg,
        embed_tokens(params["decoder"], cfg, jnp.asarray(ids)), pos)

    ids_sh = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("data")))
    with mesh:
        emb = embed_tokens(params_sh["decoder"], cfg, ids_sh)
        logits, _ = llama_forward(params_sh["decoder"], cfg, emb, pos)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
