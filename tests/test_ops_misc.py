"""Golden tests for LSTM scan (vs reference CustomLSTMCell math in torch),
RoPE (vs HF llama rope init), RMSNorm, and attention (vs torch SDPA)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtasr_tpu.ops.lstm import lstm_scan
from mtasr_tpu.ops.rope import compute_rope_freqs, rope_cos_sin, apply_rotary_emb
from mtasr_tpu.ops.norms import rms_norm
from mtasr_tpu.ops.attention import dot_product_attention, make_causal_mask

torch = pytest.importorskip("torch")


def test_lstm_scan_matches_reference_cell_math():
    """Reference: /root/reference/models/separator.py:6-24 — single fused
    Linear over [x, h] with (i, f, g, o) chunks."""
    rng = np.random.default_rng(0)
    B, T, In, H = 3, 17, 10, 12
    x = rng.standard_normal((B, T, In)).astype(np.float32)
    W = rng.standard_normal((4 * H, In + H)).astype(np.float32) * 0.3
    bias = rng.standard_normal(4 * H).astype(np.float32) * 0.1

    # torch re-implementation of the reference cell
    tx = torch.tensor(x)
    h = torch.zeros(B, H)
    c = torch.zeros(B, H)
    outs = []
    for t in range(T):
        combined = torch.cat([tx[:, t, :], h], dim=-1)
        gates = combined @ torch.tensor(W).T + torch.tensor(bias)
        i, f, g, o = gates.chunk(4, dim=-1)
        i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
        g = torch.tanh(g)
        c = f * c + i * g
        h = o * torch.tanh(c)
        outs.append(h)
    ref = torch.stack(outs, dim=1).numpy()

    ours = np.asarray(lstm_scan(jnp.asarray(x), jnp.asarray(W.T), jnp.asarray(bias)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_rope_llama3_matches_hf():
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    from transformers.models.llama.configuration_llama import LlamaConfig as HFLlamaConfig

    scaling = {"rope_type": "llama3", "factor": 32.0, "high_freq_factor": 4.0,
               "low_freq_factor": 1.0, "original_max_position_embeddings": 8192}
    hf_cfg = HFLlamaConfig(hidden_size=256, num_attention_heads=4,
                           rope_theta=500000.0, rope_scaling=dict(scaling))
    inv_hf, scale_hf = ROPE_INIT_FUNCTIONS["llama3"](hf_cfg, "cpu")
    inv_ours, scale_ours = compute_rope_freqs(64, 500000.0, scaling)
    np.testing.assert_allclose(inv_ours, inv_hf.numpy(), rtol=1e-6)
    assert scale_ours == scale_hf

    # cos/sin + rotation vs HF formulation
    pos = jnp.arange(13)[None, :]
    cos, sin = rope_cos_sin(jnp.asarray(inv_ours), pos)
    q = np.random.default_rng(1).standard_normal((1, 13, 4, 64)).astype(np.float32)
    k = q.copy()
    qr, kr = apply_rotary_emb(jnp.asarray(q), jnp.asarray(k), cos, sin)

    tcos = torch.tensor(np.asarray(cos))[:, :, :]
    tsin = torch.tensor(np.asarray(sin))
    tq = torch.tensor(q).permute(0, 2, 1, 3)  # [B, H, T, D]

    def rotate_half(t):
        x1, x2 = t[..., : t.shape[-1] // 2], t[..., t.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    ref = tq * tcos.unsqueeze(1) + rotate_half(tq) * tsin.unsqueeze(1)
    np.testing.assert_allclose(np.asarray(qr).transpose(0, 2, 1, 3),
                               ref.numpy(), rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_reference():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    tx = torch.tensor(x)
    var = tx.pow(2).mean(-1, keepdim=True)
    ref = (torch.tensor(w) * (tx * torch.rsqrt(var + 1e-6))).numpy()
    ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_attention_matches_torch_sdpa(hq, hkv):
    rng = np.random.default_rng(3)
    B, T, S, D = 2, 9, 14, 32
    q = rng.standard_normal((B, T, hq, D)).astype(np.float32)
    k = rng.standard_normal((B, S, hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, S, hkv, D)).astype(np.float32)
    causal = np.asarray(make_causal_mask(T, S, offset=S - T))[None, None]

    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                mask=jnp.asarray(causal))

    tq = torch.tensor(q).permute(0, 2, 1, 3)
    tk = torch.tensor(k).permute(0, 2, 1, 3)
    tv = torch.tensor(v).permute(0, 2, 1, 3)
    ref = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, attn_mask=torch.tensor(causal).expand(B, hq, T, S),
        enable_gqa=(hq != hkv))
    ref = ref.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_conv1d_matmul_impl_matches_xla():
    from mtasr_tpu.models.layers import conv1d
    rng = np.random.default_rng(11)
    for (T, C, O, K, S, pad) in [(101, 8, 16, 3, 2, 0), (57, 1, 8, 10, 5, 0),
                                 (64, 8, 16, 3, 2, 1)]:
        p = {"weight": jnp.asarray(rng.standard_normal((O, C, K)), jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(O), jnp.float32)}
        x = jnp.asarray(rng.standard_normal((2, T, C)), jnp.float32)
        y1 = conv1d(p, x, stride=S, padding=pad, impl="xla")
        y2 = conv1d(p, x, stride=S, padding=pad, impl="matmul")
        assert y1.shape == y2.shape
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-5, atol=1e-5)


def test_conv1d_s2d_impl_matches_xla():
    """Space-to-depth formulation (the TPU frontend default) must match the
    native conv on every WavLM frontend geometry — including odd T (the
    flagship layer-1 input is T=31999, which needs the zero-row pad) and the
    k=2*stride even/odd interleave with both output parities."""
    from mtasr_tpu.models.layers import conv1d
    rng = np.random.default_rng(12)
    cases = [(163, 1, 8, 10, 5),    # layer 0 geometry (k=2s), C_in=1
             (101, 8, 16, 3, 2),    # k=3 s=2, odd T
             (100, 8, 16, 3, 2),    # k=3 s=2, even T
             (57, 8, 16, 2, 2),     # k=s
             (41, 4, 8, 6, 3),      # generic k=2s with C_in>1
             (64, 8, 16, 3, 1)]     # unsupported geometry -> xla fallback
    for (T, C, O, K, S) in cases:
        p = {"weight": jnp.asarray(rng.standard_normal((O, C, K)), jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(O), jnp.float32)}
        x = jnp.asarray(rng.standard_normal((2, T, C)), jnp.float32)
        y1 = conv1d(p, x, stride=S, impl="xla")
        y2 = conv1d(p, x, stride=S, impl="s2d")
        assert y1.shape == y2.shape, (y1.shape, y2.shape)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-5, atol=1e-5)
