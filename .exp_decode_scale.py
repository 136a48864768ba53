"""Experiment: decode throughput vs batch and hbm_min_dilation."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.models.zoo import build_model
from wavenet_autoencoders_tpu.kernels.decode import (
    pack_decode_weights, precompute_g_add, wavenet_decode_pallas)

cfg = load_preset("svqwae")
model = build_model(cfg)
params, _ = model.init(jax.random.PRNGKey(0))
net = model.wavenet
wp = params["wavenet"]
packed = pack_decode_weights(net, wp)
rng = np.random.default_rng(0)
T = 5120

def run(B, hmd):
    lat = jnp.asarray(rng.standard_normal((B, T // 640, cfg.cin_channels)), jnp.float32)
    g = jnp.asarray(np.arange(B) % cfg.n_speakers, jnp.int32)
    c_up = net.upsample_conditioning(wp, lat)
    g_add = precompute_g_add(net, wp, g)
    try:
        codes, _ = wavenet_decode_pallas(net, packed, T, 0, c_up=c_up, g_add=g_add,
                                         dtype_str="bfloat16", hbm_min_dilation=hmd)
        float(np.asarray(codes).ravel()[0])
        t0 = time.perf_counter()
        for i in range(3):
            codes, _ = wavenet_decode_pallas(net, packed, T, i + 1, c_up=c_up,
                                             g_add=g_add, dtype_str="bfloat16",
                                             hbm_min_dilation=hmd)
            float(np.asarray(codes).ravel()[0])
        dt = (time.perf_counter() - t0) / 3
        aud = B * T / 16000 / dt
        print(f"B={B:4d} hmd={hmd}: {dt/T*1e6:7.1f} us/step  {aud:7.1f} audio-sec/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"B={B:4d} hmd={hmd}: FAIL {type(e).__name__}: {msg}")

for B, hmd in [(256, 64), (256, 16), (512, 64), (512, 16), (1024, 16), (512, 8)]:
    run(B, hmd)
