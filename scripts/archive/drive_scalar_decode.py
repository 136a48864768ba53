"""Real-chip drive of the scalar-input (MoL) fused decode — verify + bench.

Run: timeout 540 python /root/repo/scripts/drive_scalar_decode.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.kernels.decode import (
    pack_decode_weights,
    precompute_g_add,
    wavenet_decode_pallas,
)
from wavenet_autoencoders_tpu.models.zoo import build_model


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    cfg = load_preset("vocoder_raw")
    print("input_type:", cfg.input_type, "out_channels:", cfg.out_channels,
          "dist:", cfg.output_distribution)
    model = build_model(cfg)
    net = model.wavenet
    assert net.scalar_input
    params, _ = model.init(jax.random.PRNGKey(0))
    wn = params["wavenet"]

    rng = np.random.default_rng(0)
    B, T = 8, 1280
    frames = T // int(np.prod(cfg.upsample_scales)) + 2 * cfg.cin_pad
    c = jnp.asarray(rng.standard_normal((B, frames, cfg.cin_channels)), jnp.float32)
    c_up = net.upsample_conditioning(wn, c)
    assert c_up.shape[1] == T, c_up.shape
    has_g = cfg.gin_channels > 0
    g = jnp.asarray(np.arange(B) % cfg.n_speakers, jnp.int32) if has_g else None

    packed = pack_decode_weights(net, wn)
    g_add = precompute_g_add(net, wn, g)

    # ---- teacher-forced parity vs batch forward (f32) ----
    teach = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    y_ref = net.apply(wn, teach[..., None], c_up, g, upsampled=True)
    _, mixp = wavenet_decode_pallas(
        net, packed, T, 0, c_up=c_up, g_add=g_add, teach=teach, teacher=True,
        dtype_str="float32",
    )
    err = float(jnp.max(jnp.abs(mixp - y_ref)))
    print(f"teacher parity max|err| f32: {err:.3e}")
    assert err < 2e-2, err

    # ---- free-run sanity ----
    s1, _ = wavenet_decode_pallas(
        net, packed, T, 1, c_up=c_up, g_add=g_add, dtype_str="float32"
    )
    s1 = np.asarray(s1)
    assert s1.shape == (B, T) and np.isfinite(s1).all()
    assert (s1 >= -1).all() and (s1 <= 1).all()
    s2, _ = wavenet_decode_pallas(
        net, packed, T, 2, c_up=c_up, g_add=g_add, dtype_str="float32"
    )
    assert not np.array_equal(s1, np.asarray(s2)), "different seed must differ"
    print("free-run sane: range", s1.min(), s1.max())

    # ---- throughput, bf16 storage, big batch ----
    Bs, Ts = 256, 5120
    fb = Ts // int(np.prod(cfg.upsample_scales)) + 2 * cfg.cin_pad
    cb = jnp.asarray(rng.standard_normal((Bs, fb, cfg.cin_channels)), jnp.float32)
    cb_up = net.upsample_conditioning(wn, cb)
    gb = jnp.asarray(np.arange(Bs) % cfg.n_speakers, jnp.int32) if has_g else None
    gb_add = precompute_g_add(net, wn, gb)
    out, _ = wavenet_decode_pallas(
        net, packed, Ts, 0, c_up=cb_up, g_add=gb_add, dtype_str="bfloat16",
        hbm_min_dilation=64,
    )
    float(out[0, 0])  # force
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out, _ = wavenet_decode_pallas(
            net, packed, Ts, i, c_up=cb_up, g_add=gb_add, dtype_str="bfloat16",
            hbm_min_dilation=64,
        )
        float(out[0, 0])
    dt = (time.perf_counter() - t0) / reps
    aps = Bs * Ts / cfg.sample_rate / dt
    print(f"scalar MoL decode: B={Bs} T={Ts} {dt/Ts*1e6:.1f} us/step "
          f"{aps:.1f} audio-sec/s/chip")

    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= -1).all() and (o <= 1).all()
    print("OK")


if __name__ == "__main__":
    main()
