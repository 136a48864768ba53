"""Mu-law companding and pre-emphasis.

Re-implements the nnmnkwii.preprocessing functions used throughout the
reference (``audio.py:6``, ``preprocess_2019.py:75-113``,
``vqwae_train.py:47``). Written dtype-polymorphically so the same functions
work on NumPy arrays (host preprocessing) and jax.numpy arrays (on-device
decode postprocessing).

Conventions (matching nnmnkwii): the reference always passes
``mu = quantize_channels - 1`` (255), giving codes in [0, 255] with mu-law
code 127 ≈ silence.
"""
from __future__ import annotations

import numpy as np


def _xp(x):
    """Return the array namespace (numpy or jax.numpy) of ``x``."""
    t = type(x).__module__
    if t.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def mulaw(x, mu: int = 256):
    """Mu-law companding: [-1, 1] -> [-1, 1]."""
    xp = _xp(x)
    mu = float(mu)
    return xp.sign(x) * xp.log1p(mu * xp.abs(x)) / xp.log1p(mu)


def inv_mulaw(y, mu: int = 256):
    """Inverse mu-law companding: [-1, 1] -> [-1, 1]."""
    xp = _xp(y)
    mu = float(mu)
    return xp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** xp.abs(y) - 1.0)


def mulaw_quantize(x, mu: int = 256):
    """Mu-law compand + quantize: [-1, 1] -> integer codes [0, mu]."""
    y = mulaw(x, mu)
    xp = _xp(y) if not np.isscalar(y) else np
    out = (y + 1) / 2 * mu
    if np.isscalar(out):
        return int(out)
    return out.astype(xp.int64 if xp is np else "int32")


def inv_mulaw_quantize(y, mu: int = 256):
    """Integer codes [0, mu] -> waveform in [-1, 1]."""
    if np.isscalar(y):
        return float(inv_mulaw(2.0 * y / mu - 1.0, mu))
    xp = _xp(y)
    y = y.astype(xp.float32)
    return inv_mulaw(2.0 * y / mu - 1.0, mu)


def preemphasis(x, coef: float = 0.85):
    """y[t] = x[t] - coef * x[t-1]  (nnmnkwii lfilter([1, -coef], [1], x))."""
    xp = _xp(x)
    head = x[:1]
    return xp.concatenate([head, x[1:] - coef * x[:-1]])


def inv_preemphasis(x, coef: float = 0.85):
    """Inverse of :func:`preemphasis`: y[t] = x[t] + coef * y[t-1].

    An IIR scan. On NumPy uses scipy.lfilter; if handed a JAX array, uses an
    associative-scan formulation (y = cumulative coef-weighted sum) that runs
    in O(log T) depth on TPU.
    """
    xp = _xp(x)
    if xp is np:
        from scipy.signal import lfilter

        return lfilter([1], [1, -float(coef)], x)
    import jax
    import jax.numpy as jnp

    # y[t] = sum_{s<=t} coef^(t-s) x[s]: scan with first-order carry
    def step(carry, xt):
        yt = xt + coef * carry
        return yt, yt

    _, y = jax.lax.scan(step, jnp.zeros(x.shape[1:], x.dtype), x)
    return y
