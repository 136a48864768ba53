"""Conditioning upsampler: nearest-neighbour stretch + weight-normed
smoothing convolutions.

Replaces ``wavenet_vocoder/upsample.py``. One (stretch, conv) pair per scale
in ``upsample_scales``; prod(scales) = samples per conditioning frame
(presets: [4,4,8,5] = 640 for frame_rate 25, [4,4,4,5] = 320 for 50 —
SURVEY.md §2.1). ``ConvInUpsampleNetwork`` prepends a context conv of kernel
2*cin_pad+1 (valid padding).

The smoothing conv is a 2-D conv over the (C, T) "image" with a single
in/out channel (kernel (freq_ks, 2*scale+1)), exactly as the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.ops.conv import conv1d_apply, plain_conv1d_init


def _smoothing_conv_init(scale: int, freq_ks: int) -> dict:
    """Weight-normed 2D conv, weights filled 1/prod(k_size)
    (``upsample.py:42-44``)."""
    k = (freq_ks, 2 * scale + 1)
    v = jnp.full((1, 1) + k, 1.0 / float(np.prod(k)), jnp.float32)
    g = jnp.sqrt(jnp.sum(v**2))
    return {"g": g, "v": v}


def upsample_network_init(key, upsample_scales, freq_axis_kernel_size: int = 1) -> dict:
    return {
        "convs": [_smoothing_conv_init(s, freq_axis_kernel_size) for s in upsample_scales],
    }


def upsample_network_apply(
    params: dict,
    c: jnp.ndarray,
    upsample_scales,
    freq_axis_kernel_size: int = 1,
    cin_pad: int = 0,
    dtype=None,
) -> jnp.ndarray:
    """c: (B, T0, C) -> (B, T0 * prod(scales) - 2*cin_pad*prod, C)."""
    x = c[:, None, :, :].transpose(0, 1, 3, 2)  # (B, 1, C, T)
    if dtype is not None:
        x = x.astype(dtype)
    fpad = (freq_axis_kernel_size - 1) // 2
    for p, scale in zip(params["convs"], upsample_scales):
        if dtype is not None:
            x = x.astype(dtype)  # conv outputs accumulate in f32; recast
        x = jnp.repeat(x, scale, axis=3)  # nearest-neighbour time stretch
        v = p["v"]
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2))
        w = (p["g"] * v / jnp.maximum(norm, 1e-12))
        if dtype is not None:
            w = w.astype(dtype)
        x = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=[(fpad, fpad), (scale, scale)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        )
    out = x[:, 0].transpose(0, 2, 1)  # (B, T, C)
    total = int(np.prod(upsample_scales))
    indent = cin_pad * total
    if indent > 0:
        out = out[:, indent:-indent, :]
    return out


def conv_in_upsample_init(
    key, cin_channels: int, cin_pad: int, upsample_scales, freq_axis_kernel_size: int = 1
) -> dict:
    """``upsample.py:69-81``: plain (not weight-normed) context Conv1d of
    kernel 2*cin_pad+1, no bias, followed by the upsample network."""
    ks = 2 * cin_pad + 1
    k1, k2 = jax.random.split(key)
    return {
        "conv_in": plain_conv1d_init(k1, cin_channels, cin_channels, ks, bias=False),
        "upsample": upsample_network_init(k2, upsample_scales, freq_axis_kernel_size),
    }


def conv_in_upsample_apply(
    params: dict,
    c: jnp.ndarray,
    upsample_scales,
    freq_axis_kernel_size: int = 1,
    dtype=None,
) -> jnp.ndarray:
    """c: (B, T0, C) -> (B, (T0 - 2*cin_pad) * prod(scales), C)."""
    h = conv1d_apply(params["conv_in"], c, padding="VALID", dtype=dtype)
    return upsample_network_apply(
        params["upsample"], h, upsample_scales, freq_axis_kernel_size, cin_pad=0, dtype=dtype
    )
