"""Verify-skill probes for the mu-law decode path after the kernel refactor.

Run: timeout 540 python /root/repo/scripts/drive_mulaw_probes.py
"""
import os
import sys

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
    print("device:", jax.devices()[0])
    cfg = load_preset("svqwae")
    model = build_model(cfg)
    net = model.wavenet
    params, _ = model.init(jax.random.PRNGKey(0))
    wn = params["wavenet"]
    rng = np.random.default_rng(0)

    B, T = 8, 1280
    frames = T // int(np.prod(cfg.upsample_scales)) + 2 * cfg.cin_pad
    c = jnp.asarray(rng.standard_normal((B, frames, cfg.cin_channels)), jnp.float32)
    c_up = net.upsample_conditioning(wn, c)
    assert c_up.shape[1] == T, c_up.shape
    g = jnp.asarray(np.arange(B) % cfg.n_speakers, jnp.int32)
    packed = pack_decode_weights(net, wn)
    g_add = precompute_g_add(net, wn, g)

    # teacher-forced parity vs batch forward
    ids = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    y_ref = net.apply(wn, jax.nn.one_hot(ids, 256), c_up, g, upsampled=True)
    _, logits = wavenet_decode_pallas(
        net, packed, T, 0, c_up=c_up, g_add=g_add, teach=ids, teacher=True,
        dtype_str="float32",
    )
    err = float(jnp.max(jnp.abs(logits - y_ref)))
    print(f"mu-law teacher parity max|err|: {err:.3e}")
    assert err < 2e-2, err

    # variant bit-exactness: all-VMEM vs HBM ring arena (B=8 fits both)
    k1, _ = wavenet_decode_pallas(
        net, packed, T, 5, c_up=c_up, g_add=g_add, dtype_str="float32",
        hbm_min_dilation=None,
    )
    k2, _ = wavenet_decode_pallas(
        net, packed, T, 5, c_up=c_up, g_add=g_add, dtype_str="float32",
        hbm_min_dilation=64,
    )
    same = np.array_equal(np.asarray(k1), np.asarray(k2))
    print("all-VMEM vs hbm_min_dilation=64 bit-exact:", same)
    assert same

    # odd batch B=33 (pad-to-8 path)
    B2 = 33
    c2 = jnp.asarray(rng.standard_normal((B2, frames, cfg.cin_channels)), jnp.float32)
    c2_up = net.upsample_conditioning(wn, c2)
    g2 = jnp.asarray(np.arange(B2) % cfg.n_speakers, jnp.int32)
    g2_add = precompute_g_add(net, wn, g2)
    codes, _ = wavenet_decode_pallas(
        net, packed, T, 9, c_up=c2_up, g_add=g2_add, dtype_str="bfloat16",
        hbm_min_dilation=64,
    )
    a = np.asarray(codes)
    assert a.shape == (B2, T) and (a >= 0).all() and (a < 256).all()
    print("odd batch B=33 OK; codes in [0, 256)")
    print("OK")


if __name__ == "__main__":
    main()
