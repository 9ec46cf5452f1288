"""Per-layer conv frontend profile at flagship shape (B=128, 10 s)."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mtasr_tpu.config import wavlm_large_config
from mtasr_tpu.models.wavlm import init_wavlm_params, feature_encoder
from mtasr_tpu.models.layers import tree_cast, conv1d, layer_norm, gelu

cfg = wavlm_large_config(mask_time_prob=0.0, hidden_dropout=0.0,
                         attention_dropout=0.0, activation_dropout=0.0)
B, S = 128, 160000
params = jax.jit(lambda k: tree_cast(init_wavlm_params(k, cfg), jnp.bfloat16))(
    jax.random.key(0))
jax.block_until_ready(params)
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.standard_normal((B, S)), jnp.bfloat16)

fe = params["feature_extractor"]

def timeit(fn, *args, iters=3):
    o = fn(*args); np.asarray(jax.tree_util.tree_leaves(o)[0][0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args); np.asarray(jax.tree_util.tree_leaves(o)[0][0, :1])
    return (time.perf_counter() - t0) / iters, o

# full frontend
full = jax.jit(lambda w: feature_encoder(fe, cfg, w))
dt, out = timeit(full, wav)
print(f"full frontend: {dt*1e3:.1f} ms  out {out.shape}", flush=True)

# conv0 fused (production path) alone
from mtasr_tpu.ops.pallas.conv_frontend import conv0_fused
lp0 = fe["conv_layers"]["0"]
c0 = jax.jit(lambda w: conv0_fused(
    w, lp0["conv"]["weight"], lp0["conv"].get("bias"),
    lp0["layer_norm"]["weight"], lp0["layer_norm"]["bias"],
    stride=5, fuse_ln=True, fuse_act=True))
dt0, x = timeit(c0, wav)
print(f"conv0 fused: {dt0*1e3:.1f} ms  out {x.shape}", flush=True)

# each subsequent layer i: conv + LN + gelu, individually jitted
for i in range(1, 7):
    k, s = cfg.conv_kernel[i], cfg.conv_stride[i]
    lp = fe["conv_layers"][str(i)]
    def layer(xx, lp=lp, s=s):
        y = conv1d(lp["conv"], xx, stride=s, impl=cfg.conv_impl)
        y = layer_norm(lp["layer_norm"], y)
        return gelu(y)
    f = jax.jit(layer)
    dt_i, xn = timeit(f, x)
    Bx, T, C = x.shape
    To = xn.shape[1]
    flops = 2 * Bx * To * C * xn.shape[2] * k
    traf = (Bx*T*C + Bx*To*xn.shape[2]) * 2
    print(f"conv{i} k={k} s={s}: {dt_i*1e3:6.1f} ms  in {x.shape} -> {xn.shape}"
          f"  {flops/dt_i/1e12:5.1f} TF/s  mintraffic {traf/1e9:.2f} GB"
          f" ({traf/dt_i/1e9:.0f} GB/s)", flush=True)
    x = xn

# conv-only variant (no LN/gelu) for layer 1 to separate epilogue cost
x1 = c0(wav)
lp1 = fe["conv_layers"]["1"]
f_conv = jax.jit(lambda xx: conv1d(lp1["conv"], xx, stride=2,
                                   impl=cfg.conv_impl))
dt_c, _ = timeit(f_conv, x1)
print(f"conv1 conv-only: {dt_c*1e3:.1f} ms", flush=True)
