"""Embedding + gated residual block (the WaveNet cell).

Replaces ``wavenet_vocoder/modules.py:21-169``. Two execution modes:

- ``residual_glu_apply``: teacher-forced batch mode over (B, T, C) — dilated
  causal conv lowered onto the MXU.
- ``residual_glu_step``: single AR decode step with an O(1) circular input
  buffer per layer — the TPU-native replacement for the reference's
  shift-every-step linearized queue (``conv.py:17-46``), designed to live
  inside ``lax.scan`` / a Pallas kernel without per-step buffer copies.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from wavenet_autoencoders_tpu.ops.conv import (
    causal_conv1d_apply,
    conv1d_apply,
    conv1d_init,
    conv1d_weight,
)


def embedding_init(key, num: int, dim: int, std: float = 0.01) -> dict:
    """``modules.py:21-24``: N(0, std) embedding table."""
    return {"table": std * jax.random.normal(key, (num, dim), jnp.float32)}


def embedding_apply(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


# ---------------------------------------------------------------------------
# Residual dilated conv + GLU
# ---------------------------------------------------------------------------


def residual_glu_init(
    key,
    residual_channels: int,
    gate_channels: int,
    kernel_size: int,
    skip_out_channels: int | None = None,
    cin_channels: int = -1,
    gin_channels: int = -1,
    bias: bool = True,
) -> dict:
    """Parameters of one ResidualConv1dGLU (``modules.py:71-107``)."""
    if skip_out_channels is None:
        skip_out_channels = residual_channels
    ks = jax.random.split(key, 5)
    gate_out = gate_channels // 2
    p = {
        "conv": conv1d_init(ks[0], residual_channels, gate_channels, kernel_size, bias=bias),
        "out": conv1d_init(ks[1], gate_out, residual_channels, 1, bias=bias),
        "skip": conv1d_init(ks[2], gate_out, skip_out_channels, 1, bias=bias),
    }
    if cin_channels > 0:
        p["cproj"] = conv1d_init(ks[3], cin_channels, gate_channels, 1, bias=False)
    if gin_channels > 0:
        p["gproj"] = conv1d_init(ks[4], gin_channels, gate_channels, 1, bias=False)
    return p


def _gate(x, c_add, g_add):
    # conv output split into (tanh, sigmoid) halves along channels —
    # torch split order (modules.py:138-154): first half -> tanh
    half = x.shape[-1] // 2
    a, b = x[..., :half], x[..., half:]
    if c_add is not None:
        ca, cb = c_add[..., :half], c_add[..., half:]
        a, b = a + ca, b + cb
    if g_add is not None:
        ga, gb = g_add[..., :half], g_add[..., half:]
        a, b = a + ga, b + gb
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def residual_glu_apply(
    params: dict,
    x: jnp.ndarray,
    c: jnp.ndarray | None = None,
    g: jnp.ndarray | None = None,
    *,
    dilation: int = 1,
    dropout: float = 0.0,
    rng=None,
    dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch forward (``modules.py:115-163``).

    x: (B, T, residual); c: (B, T, cin) or None; g: (B, gin) or (B, T, gin).
    Returns (residual_out, skip) with the sqrt(0.5) residual scaling.
    """
    residual = x
    if dropout > 0.0 and rng is not None:
        keep = 1.0 - dropout
        x = x * jax.random.bernoulli(rng, keep, x.shape).astype(x.dtype) / keep
    h = causal_conv1d_apply(params["conv"], x, dilation=dilation, dtype=dtype)
    c_add = conv1d_apply(params["cproj"], c, dtype=dtype) if c is not None else None
    if g is not None:
        if g.ndim == 2:
            g = g[:, None, :]
        g_add = conv1d_apply(params["gproj"], g, dtype=dtype)
    else:
        g_add = None
    gated = _gate(h, c_add, g_add)
    s = conv1d_apply(params["skip"], gated, dtype=dtype)
    out = conv1d_apply(params["out"], gated, dtype=dtype)
    out = (out + residual) * math.sqrt(0.5)
    return out, s


# ---------------------------------------------------------------------------
# Single-step AR decode with circular buffers
# ---------------------------------------------------------------------------


def glu_buffer_len(kernel_size: int, dilation: int) -> int:
    """Ring-buffer slots a layer needs: (k-1)*d past inputs
    (cf. reference queue size kw+(kw-1)(dilation-1) ≡ (k-1)d+1 incl. the
    current input, ``conv.py:35``)."""
    return (kernel_size - 1) * dilation


def residual_glu_step(
    params: dict,
    x_t: jnp.ndarray,
    buf: jnp.ndarray,
    t: jnp.ndarray,
    ct: jnp.ndarray | None = None,
    gt: jnp.ndarray | None = None,
    *,
    dilation: int = 1,
    kernel_size: int = 3,
    dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One AR step. x_t: (B, C); buf: (B, L, C) circular with L=(k-1)*d;
    t: scalar step index. Returns (out, skip, new_buf).

    Taps x_{t-j*d} live at slot (t - j*d) mod L; x_t is written to slot
    t mod L afterwards (read-before-write), so no per-step shifting.
    Unwritten slots are zero — matching the reference's zero-initialized
    queue (``conv.py:34-36``).
    """
    L = glu_buffer_len(kernel_size, dilation)
    w = conv1d_weight(params["conv"], dtype)  # (k, Cin, Cgate)
    xc = x_t.astype(dtype) if dtype is not None else x_t
    # current input through the last tap
    h = jnp.einsum("bc,cd->bd", xc, w[kernel_size - 1], preferred_element_type=jnp.float32)
    for j in range(1, kernel_size):
        idx = jnp.mod(t - j * dilation, L)
        tap = jax.lax.dynamic_slice_in_dim(buf, idx, 1, axis=1)[:, 0, :]
        if dtype is not None:
            tap = tap.astype(dtype)
        h = h + jnp.einsum(
            "bc,cd->bd", tap, w[kernel_size - 1 - j], preferred_element_type=jnp.float32
        )
    if "b" in params["conv"]:
        h = h + params["conv"]["b"]

    c_add = None
    if ct is not None:
        wc = conv1d_weight(params["cproj"], dtype)[0]
        c_add = jnp.einsum("bc,cd->bd", ct.astype(wc.dtype), wc, preferred_element_type=jnp.float32)
    g_add = None
    if gt is not None:
        wg = conv1d_weight(params["gproj"], dtype)[0]
        g_add = jnp.einsum("bc,cd->bd", gt.astype(wg.dtype), wg, preferred_element_type=jnp.float32)

    gated = _gate(h, c_add, g_add)

    ws = conv1d_weight(params["skip"], dtype)[0]
    s = jnp.einsum("bc,cd->bd", gated.astype(ws.dtype), ws, preferred_element_type=jnp.float32)
    if "b" in params["skip"]:
        s = s + params["skip"]["b"]
    wo = conv1d_weight(params["out"], dtype)[0]
    out = jnp.einsum("bc,cd->bd", gated.astype(wo.dtype), wo, preferred_element_type=jnp.float32)
    if "b" in params["out"]:
        out = out + params["out"]["b"]
    out = (out + x_t) * math.sqrt(0.5)

    new_buf = jax.lax.dynamic_update_slice_in_dim(
        buf, x_t.astype(buf.dtype)[:, None, :], jnp.mod(t, L), axis=1
    )
    return out, s, new_buf
