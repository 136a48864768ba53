"""Weight-normalized 1-D convolutions (functional, channels-last).

Replaces the reference's incremental-conv machinery (``conv.py:7-65``) and
the weight-normed factory (``modules.py:13-18``). Weight normalization is an
explicit (g, v) parameterization: w = g * v / ||v||, with g per output
channel and the norm over (kernel, in) dims — identical to
torch.nn.utils.weight_norm(dim=0) on a (out, in, k) conv weight.

Kernel layout is (K, Cin, Cout) = lax 'WIO', so apply-time folding is a
cheap normalize-and-scale and every conv lowers to MXU matmuls.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_normal(key, k, cin, cout, gain=math.sqrt(2.0)):
    # torch kaiming_normal_(nonlinearity='relu'), fan_in = cin * k
    std = gain / math.sqrt(cin * k)
    return std * jax.random.normal(key, (k, cin, cout), jnp.float32)


def conv1d_init(key, cin: int, cout: int, k: int, bias: bool = True) -> dict:
    """Weight-normed conv params: {'g': (Cout,), 'v': (K, Cin, Cout)[, 'b']}.

    Init matches ``modules.py:13-18``: Kaiming-normal(relu) weight, zero
    bias, then weight-norm decomposition g=||w||, v=w.
    """
    w = _kaiming_normal(key, k, cin, cout)
    g = jnp.sqrt(jnp.sum(w**2, axis=(0, 1)))
    p = {"g": g, "v": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def plain_conv1d_init(key, cin: int, cout: int, k: int, bias: bool = True) -> dict:
    """Un-normalized conv with torch nn.Conv1d default init (kaiming-uniform
    a=sqrt(5) → U(±1/sqrt(fan_in))), as used by the encoder blocks
    (``vqvae_model.py:15``) and the upsample context conv
    (``upsample.py:78``)."""
    bound = 1.0 / math.sqrt(cin * k)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def conv1d_weight(params: dict, dtype=None) -> jnp.ndarray:
    """Fold (g, v) -> w. For plain convs returns w directly."""
    if "w" in params:
        w = params["w"]
    else:
        v = params["v"]
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1), keepdims=True))
        w = params["g"][None, None, :] * v / jnp.maximum(norm, 1e-12)
    return w.astype(dtype) if dtype is not None else w


def conv1d_apply(
    params: dict,
    x: jnp.ndarray,
    *,
    dilation: int = 1,
    stride: int = 1,
    padding="SAME",
    dtype=None,
) -> jnp.ndarray:
    """Conv over (B, T, Cin) -> (B, T', Cout).

    padding: 'SAME' | 'VALID' | 'CAUSAL' | explicit [(lo, hi)].
    'CAUSAL' left-pads (k-1)*dilation — equivalent to the reference's
    symmetric-pad-then-truncate (``modules.py:83,136``).
    """
    w = conv1d_weight(params, dtype)
    k = w.shape[0]
    if dtype is not None:
        x = x.astype(dtype)
    # Under bf16, outputs stay bf16 (the MXU still accumulates f32
    # internally); requesting f32 outputs breaks the conv VJP's dtype
    # matching. The f32 path keeps explicit f32 accumulation.
    acc = jnp.float32 if x.dtype == jnp.float32 else None
    if k == 1 and stride == 1:
        # 1x1 conv is a single MXU matmul
        y = jnp.einsum("btc,cd->btd", x, w[0], preferred_element_type=acc)
    else:
        if padding == "CAUSAL":
            pad = [((k - 1) * dilation, 0)]
        elif padding == "SAME":
            total = (k - 1) * dilation
            pad = [(total // 2, total - total // 2)]
        elif padding == "VALID":
            pad = [(0, 0)]
        else:
            pad = padding
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride,),
            padding=pad,
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=acc,
        )
    if "b" in params:
        y = y + params["b"][None, None, :]
    return y


def causal_conv1d_apply(params, x, *, dilation=1, dtype=None):
    return conv1d_apply(params, x, dilation=dilation, padding="CAUSAL", dtype=dtype)


def linear_init(key, cin: int, cout: int, bias: bool = True) -> dict:
    """torch nn.Linear default init (``vqvae_model.py:46``)."""
    bound = 1.0 / math.sqrt(cin)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def linear_apply(params: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    w = params["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = x @ w
    if "b" in params:
        y = y + params["b"]
    return y


def receptive_field_size(
    total_layers: int, num_cycles: int, kernel_size: int, dilation=lambda x: 2**x
) -> int:
    """``wavenet.py:42-60``."""
    assert total_layers % num_cycles == 0
    layers_per_cycle = total_layers // num_cycles
    dilations = [dilation(i % layers_per_cycle) for i in range(total_layers)]
    return (kernel_size - 1) * sum(dilations) + 1
