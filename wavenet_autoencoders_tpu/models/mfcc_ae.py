"""Feature-space (MFCC-only) autoencoders.

The reference's ``build_autoencoder_model`` path
(``inference_2019.py:157-159``): ``eval(hparams.name)(c_in, hid=64)`` over
the gitignored ``autoencoders/autoencoder.Model/Model2/Model4`` and
``cat_ae_model.Model``. Only the ctor signature and the uniform ``encode``
interface survive in the snapshot; these are reconstructions:

- ``MfccAE``  — conv encoder + mirror decoder over MFCC frames, MSE
  reconstruction; Model/Model2/Model4 differ by temporal downsampling
  (1x / 2x / 4x — the names' most natural reading, giving 100/50/25 Hz
  representations for ABX).
- ``CatMfccAE`` — same with a Gumbel-softmax categorical bottleneck.

Used for ABX representation export only (no waveform decoder).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from wavenet_autoencoders_tpu.models import bottlenecks as bn
from wavenet_autoencoders_tpu.models.encoder import Encoder, _block_apply, _block_init
from wavenet_autoencoders_tpu.ops.conv import linear_apply, linear_init


@dataclass(frozen=True)
class MfccAE:
    c_in: int = 39
    hid: int = 64
    enc_hid: int = 256
    downsample: int = 1

    def make_encoder(self) -> Encoder:
        return Encoder(c_in=self.c_in, hid=self.enc_hid, c_out=self.hid, downsample=self.downsample)

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        dec = {
            "lin": linear_init(k2, self.hid, self.enc_hid),
            "blocks": [
                _block_init(k3, self.enc_hid, self.enc_hid, 3),
                _block_init(k4, self.enc_hid, self.enc_hid, 3),
            ],
            "out": linear_init(k5, self.enc_hid, self.c_in),
        }
        return {"encoder": self.make_encoder().init(k1), "decoder": dec}, {}

    def encode(self, params, state, c, tar_c=None, dtype=None):
        return self.make_encoder().apply(params["encoder"], c, dtype=dtype)

    def _decode_feat(self, params, z, dtype=None):
        h = linear_apply(params["decoder"]["lin"], z, dtype=dtype)
        if self.downsample > 1:
            h = jnp.repeat(h, self.downsample, axis=1)
        for p in params["decoder"]["blocks"]:
            h = _block_apply(p, h, 3, 1, residual=True, dtype=dtype)
        return linear_apply(params["decoder"]["out"], h, dtype=dtype)

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None):
        """Uniform zoo signature; reconstruction target is c itself.
        Returns (c_hat, aux_loss=0, perplexity=0, state)."""
        z = self.encode(params, state, c, dtype=dtype)
        c_hat = self._decode_feat(params, z, dtype=dtype)
        return c_hat, jnp.float32(0.0), jnp.float32(0.0), state


@dataclass(frozen=True)
class CatMfccAE(MfccAE):
    k: int = 128
    tau: float = 0.1
    hard: bool = False
    slices: int = 4

    def init(self, key):
        (params, state) = super().init(key)
        kg = jax.random.fold_in(key, 99)
        params["gumbel"] = bn.gumbel_init(kg, self.hid, self.k, self.slices)
        return params, state

    def encode(self, params, state, c, tar_c=None, dtype=None):
        z = self.make_encoder().apply(params["encoder"], c, dtype=dtype)
        q, _l, _p, _i = bn.gumbel_apply(params["gumbel"], z, None, tau=self.tau, hard=self.hard, train=False)
        return q

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None):
        z = self.make_encoder().apply(params["encoder"], c, dtype=dtype)
        rng, sk = jax.random.split(rng)
        q, aux, perp, _ = bn.gumbel_apply(params["gumbel"], z, sk, tau=self.tau, hard=self.hard, train=train)
        c_hat = self._decode_feat(params, q, dtype=dtype)
        return c_hat, aux, perp, state
