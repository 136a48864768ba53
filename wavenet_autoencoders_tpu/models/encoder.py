"""Convolutional content / speaker encoders.

Content encoder re-designs ``vqvae_model.py:9-51``: a 10-block Conv-ReLU
stack with identity residuals (when stride 1 and matching dims) and k5/s2
temporal downsampling blocks, followed by a linear projection. The number of
stride-2 blocks is derived from the latent frame rate (100 Hz MFCCs →
frame_rate): 25 Hz → 2 blocks (the committed model), 50 Hz → 1 (the
gitignored INAE family, whose ``frame_rate`` ctor arg is the evidence —
``synthesis.py:112,147``).

The speaker encoder (for NewINAE's continuous speaker code,
``synthesis.py:80-113``: gin=64, use_speaker_embedding=False) is a
reconstruction: conv stack + temporal average pool + linear.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from wavenet_autoencoders_tpu.ops.conv import (
    conv1d_apply,
    linear_apply,
    linear_init,
    plain_conv1d_init,
)


def _block_init(key, cin, cout, k):
    return plain_conv1d_init(key, cin, cout, k, bias=True)


def _block_apply(p, x, k, stride, residual, dtype=None):
    # torch-style padding k//2 both sides, then strided conv; ReLU; residual
    # AFTER the ReLU (vqvae_model.py:17-23)
    pad = k // 2
    out = conv1d_apply(p, x, stride=stride, padding=[(pad, pad)], dtype=dtype)
    out = jax.nn.relu(out)
    if residual:
        out = out + x
    return out


@dataclass(frozen=True)
class Encoder:
    c_in: int = 39
    hid: int = 768
    c_out: int = 64
    downsample: int = 4  # 100 Hz -> 100/downsample latent frame rate

    def _blocks(self):
        """(kernel, stride) per block; stride-2 count = log2(downsample)."""
        n_ds = {1: 0, 2: 1, 4: 2}[self.downsample]
        specs = [(3, 1), (3, 1)]
        specs += [(5, 2)] * n_ds + [(5, 1)] * (2 - n_ds)
        specs += [(3, 1), (3, 1)] + [(1, 1)] * 4
        return specs

    def init(self, key) -> dict:
        specs = self._blocks()
        keys = jax.random.split(key, len(specs) + 1)
        blocks = []
        cin = self.c_in
        for i, (k, _s) in enumerate(specs):
            blocks.append(_block_init(keys[i], cin, self.hid, k))
            cin = self.hid
        return {"blocks": blocks, "lin": linear_init(keys[-1], self.hid, self.c_out)}

    def apply(self, params: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
        """x: (B, T, c_in) -> (B, T/downsample, c_out)."""
        specs = self._blocks()
        h = x
        cin = self.c_in
        for p, (k, s) in zip(params["blocks"], specs):
            res = s == 1 and cin == self.hid
            h = _block_apply(p, h, k, s, residual=res, dtype=dtype)
            cin = self.hid
        return linear_apply(params["lin"], h, dtype=dtype)


@dataclass(frozen=True)
class SpeakerEncoder:
    """Utterance-level speaker code: conv stack → masked mean pool → linear."""

    c_in: int = 39
    hid: int = 128
    c_out: int = 64

    def init(self, key) -> dict:
        keys = jax.random.split(key, 4)
        return {
            "blocks": [
                _block_init(keys[0], self.c_in, self.hid, 3),
                _block_init(keys[1], self.hid, self.hid, 3),
                _block_init(keys[2], self.hid, self.hid, 3),
            ],
            "lin": linear_init(keys[3], self.hid, self.c_out),
        }

    def apply(self, params: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
        """x: (B, T, c_in) -> (B, c_out)."""
        h = x
        for i, p in enumerate(params["blocks"]):
            res = i > 0
            h = _block_apply(p, h, 3, 1, residual=res, dtype=dtype)
        pooled = jnp.mean(h, axis=1)
        return linear_apply(params["lin"], pooled, dtype=dtype)
