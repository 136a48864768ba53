"""The WaveNet-autoencoder model zoo.

Uniform interface (established by ``vqvae_model.py:66-84`` and the train /
infer / synthesis call sites):

    init(key)                                   -> (params, state)
    forward(params, state, rng, x, c, g, train) -> (y_hat, aux_loss,
                                                    perplexity, new_state)
    encode(params, state, c)                    -> latent (B, T', D)
    decode(params, key, c, g, T, ...)           -> sampled codes/waveform

``state`` carries non-gradient quantizer state (EMA codebooks); for models
without it, it is the empty dict.

Model families (ctor signatures recovered from ``inference_2019.py:72-192``
and ``synthesis.py:78-233`` — the implementations themselves are gitignored
upstream, see SURVEY.md caveat):

- WVAE     — continuous bottleneck (``AE(wavenet, c_in, hid=64, frame_rate)``)
- VQWAE    — superset VQ model (plain/sliced/EMA VQ, instance norm,
             post-conv, time jitter, VQ dropout, AdaIN, K1, num_slices)
- INWAE    — instance-norm AE (INAE / INAE1), speaker-id embedding + AdaIN
             voice conversion via a target-speaker utterance (tar_c)
- NewINWAE — like INWAE but the speaker code is a learned continuous
             embedding from a speaker encoder (gin=64, no id embedding)
- CatWAE   — Gumbel-softmax categorical bottleneck
             (``CatWavAE(tau=0.1, k, hard, slices)``)

All activations channels-last (B, T, C).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from wavenet_autoencoders_tpu.models import bottlenecks as bn
from wavenet_autoencoders_tpu.models.encoder import Encoder, SpeakerEncoder
from wavenet_autoencoders_tpu.models.wavenet import WaveNet


@dataclass(frozen=True)
class WAEBase:
    wavenet: WaveNet
    c_in: int = 39
    hid: int = 64
    frame_rate: int = 25
    encoder_hid: int = 768

    @property
    def downsample(self) -> int:
        return 100 // self.frame_rate

    def make_encoder(self) -> Encoder:
        return Encoder(
            c_in=self.c_in, hid=self.encoder_hid, c_out=self.hid, downsample=self.downsample
        )

    # shared plumbing ---------------------------------------------------
    def _decoder_forward(self, params, x, c_lat, g, rng, train, dtype=None):
        return self.wavenet.apply(
            params["wavenet"], x, c_lat, g, rng=rng, train=train, dtype=dtype
        )

    def decode(self, params, key, c, g=None, T=None, state=None, tar_c=None, **kw):
        """AR generation conditioned on features c (B, T', c_in).

        Default T accounts for the 2*cin_pad*prod(scales) context trim the
        conditioning upsampler applies (``ops/upsample.py:64-71``, mirroring
        reference ``wavenet_vocoder/upsample.py:69-85``): cin_pad latent
        frames on each side are context, not audio."""
        lat = self.encode(params, state if state is not None else {}, c, tar_c=tar_c)
        if T is None:
            if not self.wavenet.upsample_conditional_features:
                raise ValueError(
                    "pass T explicitly when upsample_conditional_features is "
                    "off (T = latent frames * sample_rate // frame_rate; see "
                    "eval.synthesize.batch_wavegen)"
                )
            T = (lat.shape[1] - 2 * self.wavenet.cin_pad) * self._up_factor()
        return self.wavenet.decode(params["wavenet"], key, T, c=lat, g=g, **kw)

    def _up_factor(self):
        import numpy as np

        return int(np.prod(self.wavenet.upsample_scales))


# ---------------------------------------------------------------------------
# WVAE — continuous bottleneck (AE)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WVAE(WAEBase):
    def init(self, key):
        k1, k2 = jax.random.split(key)
        enc = self.make_encoder()
        return {"encoder": enc.init(k1), "wavenet": self.wavenet.init(k2)}, {}

    def encode(self, params, state, c, tar_c=None, dtype=None):
        return self.make_encoder().apply(params["encoder"], c, dtype=dtype)

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None):
        lat = self.encode(params, state, c, dtype=dtype)
        y_hat = self._decoder_forward(params, x, lat, g, rng, train, dtype)
        return y_hat, jnp.float32(0.0), jnp.float32(0.0), state


# ---------------------------------------------------------------------------
# VQWAE — the full VQ family (committed VQVAE ∪ gitignored superset)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VQWAE(WAEBase):
    K: int = 256
    K1: int | None = None
    num_slices: int = 2
    beta: float = 0.25
    # scale on the encoder-pull term of the sliced-VQ loss (1.0 =
    # reference parity; see bottlenecks.sliced_vq_apply)
    commit_scale: float = 1.0
    ema: bool = False
    ema_decay: float = 0.99
    sliced: bool = False
    ins_norm: bool = False
    post_conv: bool = False
    adain: bool = False
    use_time_jitter: bool = False
    time_jitter_prob: float = 0.12
    time_jitter_per_side: bool = True
    vq_drop: bool = False
    drop_dim: int = 0
    # dead-code revival (anti-collapse; see bottlenecks.reseed_slice)
    reseed: bool = False
    reseed_thresh: float = 0.1
    reseed_decay: float = 0.99
    reseed_start: int = 500

    def _codebook_sizes(self) -> list[int]:
        return bn._slice_sizes(self.K, self.K1, self.num_slices if self.sliced else 1)

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        enc = self.make_encoder()
        params = {"encoder": enc.init(k1), "wavenet": self.wavenet.init(k2)}
        state = {}
        if self.ema:
            state["vq"] = bn.vq_ema_init(
                k3, self.K, self.hid, num_slices=self.num_slices if self.sliced else 1, K1=self.K1
            )
        elif self.sliced:
            params["vq"] = bn.sliced_vq_init(k3, self.K, self.hid, self.num_slices, self.K1)
        else:
            params["vq"] = bn.vq_init(k3, self.K, self.hid)
        if self.reseed:
            state["usage"] = [
                jnp.full((s,), 1.0 / s, jnp.float32) for s in self._codebook_sizes()
            ]
        if self.post_conv:
            # project quantized code up to the decoder's cin_channels
            from wavenet_autoencoders_tpu.ops.conv import plain_conv1d_init

            params["post"] = plain_conv1d_init(k4, self.hid, self.wavenet.cin_channels, 3)
        return params, state

    def _pre_vq(self, z, rng, train):
        if self.ins_norm:
            z = bn.instance_norm(z)
        if train and self.vq_drop and self.drop_dim > 0 and rng is not None:
            rng, sk = jax.random.split(rng)
            z = bn.vq_dropout(sk, z, self.drop_dim)
        return z, rng

    def _quantize(self, params, state, z, train):
        if self.ema:
            q, loss, perp, idx, new_vq = bn.vq_ema_apply(
                state["vq"], z, beta=self.beta, decay=self.ema_decay, train=train
            )
            return q, loss, perp, idx, {**state, "vq": new_vq}
        if self.sliced:
            q, loss, perp, idx = bn.sliced_vq_apply(
                params["vq"], z, beta=self.beta, commit_scale=self.commit_scale
            )
        else:
            q, loss, perp, idx = bn.vq_apply(params["vq"], z, beta=self.beta)
        return q, loss, perp, idx, state

    def _post_vq(self, params, q, rng, train, dtype=None, jitter_scale=1.0):
        if train and self.use_time_jitter and rng is not None:
            rng, sk = jax.random.split(rng)
            # jitter_scale may be a traced 0/1 gate (cfg.time_jitter_start:
            # delay jitter past the commitment warm-up — round-4 run E
            # showed jitter-from-step-0 re-collapses the codebook)
            q = bn.time_jitter(
                sk, q, self.time_jitter_prob * jitter_scale,
                per_side=self.time_jitter_per_side,
            )
        if self.post_conv:
            from wavenet_autoencoders_tpu.ops.conv import conv1d_apply

            q = conv1d_apply(params["post"], q, padding=[(1, 1)], dtype=dtype)
        return q

    def encode(self, params, state, c, tar_c=None, dtype=None, pre_vq=False):
        """Quantized latent (B, T', hid) — the ABX representation
        (``vqvae_model.py:80-84``). With adain and a target utterance,
        re-styles the pre-VQ code first. ``pre_vq=True`` returns the
        continuous pre-quantization code (post instance-norm) — a
        diagnostic export with no reference counterpart (the challenge
        scored the quantized code)."""
        enc = self.make_encoder()
        z = enc.apply(params["encoder"], c, dtype=dtype)
        if tar_c is not None and self.adain:
            zs = enc.apply(params["encoder"], tar_c, dtype=dtype)
            z = bn.adain(z, zs)
        elif self.ins_norm:
            z = bn.instance_norm(z)
        if pre_vq:
            return z
        q, _loss, _perp, _idx, _state = self._quantize(params, state, z, train=False)
        return q

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None,
                jitter_scale=1.0):
        enc = self.make_encoder()
        z = enc.apply(params["encoder"], c, dtype=dtype)
        z, rng = self._pre_vq(z, rng, train)
        q, vq_loss, perp, idx, new_state = self._quantize(params, state, z, train)
        if train and self.reseed:
            # stash what revival needs (train.step pops this after the
            # optimizer update, so the returned-state structure the loop
            # sees stays invariant): pre-VQ encoder outputs as reseed
            # candidates + per-slice assignment fractions
            idxs = idx if idx.ndim == 3 else idx[..., None]
            sizes = self._codebook_sizes()
            counts = [
                jnp.mean(jax.nn.one_hot(idxs[..., i].reshape(-1), s), axis=0)
                for i, s in enumerate(sizes)
            ]
            flat = jax.lax.stop_gradient(
                z.reshape(-1, z.shape[-1]).astype(jnp.float32)
            )
            new_state = {**new_state, "_vq_diag": {"z": flat, "counts": counts}}
        q = self._post_vq(params, q, rng, train, dtype, jitter_scale=jitter_scale)
        y_hat = self._decoder_forward(params, x, q, g, rng, train, dtype)
        return y_hat, vq_loss, perp, new_state

    def revive(self, params, state, diag, rng, step):
        """Dead-code revival, run by the train step AFTER the optimizer
        update: refresh per-code usage EMAs from this batch's assignment
        counts, then re-seed codebook rows whose usage fell below
        ``reseed_thresh/K`` with random encoder outputs from the batch.
        For the EMA bottleneck the cluster statistics of revived rows are
        patched too (cs←mean cluster size, ew←cand·cs) so the next EMA
        update does not immediately revert the row.

        Returns (params, state, n_reseeded)."""
        sizes = self._codebook_sizes()
        n = len(sizes)
        sub = self.hid // n
        z = diag["z"]
        active = step >= self.reseed_start
        usage, n_dead = [], jnp.float32(0.0)
        if self.ema:
            vq = dict(state["vq"])
            books = list(vq["codebooks"])
            css = list(vq["cluster_size"])
            ews = list(vq["ema_w"])
        else:
            books = (
                list(params["vq"]["codebooks"]) if self.sliced
                else [params["vq"]["codebook"]]
            )
        for i in range(n):
            u = bn.update_usage(state["usage"][i], diag["counts"][i], self.reseed_decay)
            z_slice = z[:, i * sub : (i + 1) * sub]
            cb, u, dead = bn.reseed_slice(
                jax.random.fold_in(rng, i), books[i], u, z_slice,
                self.reseed_thresh, active,
            )
            if self.ema:
                mean_cs = jnp.mean(css[i])
                css[i] = jnp.where(dead, mean_cs, css[i])
                ews[i] = jnp.where(dead[:, None], cb * mean_cs, ews[i])
            books[i] = cb
            usage.append(u)
            n_dead = n_dead + jnp.sum(dead.astype(jnp.float32))
        new_state = {**state, "usage": usage}
        if self.ema:
            new_state["vq"] = {"codebooks": books, "cluster_size": css, "ema_w": ews}
            return params, new_state, n_dead
        if self.sliced:
            new_params = {**params, "vq": {"codebooks": books}}
        else:
            new_params = {**params, "vq": {"codebook": books[0]}}
        return new_params, new_state, n_dead


# ---------------------------------------------------------------------------
# INWAE — instance-norm AE (INAE / INAE1)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class INWAE(WAEBase):
    """INAE: IN on the latent. INAE1 (``per_block_in=True``): additionally
    instance-normalizes after every encoder conv block (reconstruction
    decision — the two variants share a ctor signature upstream,
    ``synthesis.py:146-149``)."""

    adain: bool = True
    per_block_in: bool = False

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoder": self.make_encoder().init(k1), "wavenet": self.wavenet.init(k2)}, {}

    def _encode_raw(self, params, c, dtype=None):
        enc = self.make_encoder()
        if not self.per_block_in:
            return enc.apply(params["encoder"], c, dtype=dtype)
        # per-block IN variant
        specs = enc._blocks()
        h = c
        cin = enc.c_in
        from wavenet_autoencoders_tpu.models.encoder import _block_apply
        from wavenet_autoencoders_tpu.ops.conv import linear_apply

        for p, (k, s) in zip(params["encoder"]["blocks"], specs):
            res = s == 1 and cin == enc.hid
            h = _block_apply(p, h, k, s, residual=res, dtype=dtype)
            h = bn.instance_norm(h)
            cin = enc.hid
        return linear_apply(params["encoder"]["lin"], h, dtype=dtype)

    def encode(self, params, state, c, tar_c=None, dtype=None):
        z = self._encode_raw(params, c, dtype=dtype)
        if tar_c is not None and self.adain:
            zs = self._encode_raw(params, tar_c, dtype=dtype)
            return bn.adain(z, zs)
        return bn.instance_norm(z)

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None):
        lat = self.encode(params, state, c, dtype=dtype)
        y_hat = self._decoder_forward(params, x, lat, g, rng, train, dtype)
        return y_hat, jnp.float32(0.0), jnp.float32(0.0), state


# ---------------------------------------------------------------------------
# NewINWAE — continuous learned speaker code
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NewINWAE(WAEBase):
    """``NewINAE`` (``synthesis.py:80-113``): wavenet gets gin_channels=64
    continuous global features from a speaker encoder instead of an id
    embedding (use_speaker_embedding=False)."""

    speaker_hid: int = 128

    def make_speaker_encoder(self) -> SpeakerEncoder:
        return SpeakerEncoder(c_in=self.c_in, hid=self.speaker_hid, c_out=self.wavenet.gin_channels)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoder": self.make_encoder().init(k1),
            "spk": self.make_speaker_encoder().init(k2),
            "wavenet": self.wavenet.init(k3),
        }, {}

    def speaker_code(self, params, c, dtype=None):
        return self.make_speaker_encoder().apply(params["spk"], c, dtype=dtype)

    def encode(self, params, state, c, tar_c=None, dtype=None):
        z = self.make_encoder().apply(params["encoder"], c, dtype=dtype)
        if tar_c is not None:
            zs = self.make_encoder().apply(params["encoder"], tar_c, dtype=dtype)
            return bn.adain(z, zs)
        return bn.instance_norm(z)

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None):
        # g (speaker ids) is ignored; the speaker code comes from the input
        # features themselves
        lat = self.encode(params, state, c, dtype=dtype)
        spk = self.speaker_code(params, c, dtype=dtype)
        y_hat = self._decoder_forward(params, x, lat, spk, rng, train, dtype)
        return y_hat, jnp.float32(0.0), jnp.float32(0.0), state


# ---------------------------------------------------------------------------
# CatWAE — Gumbel-softmax categorical bottleneck
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CatWAE(WAEBase):
    k: int = 128
    tau: float = 0.1
    hard: bool = False
    slices: int = 4

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoder": self.make_encoder().init(k1),
            "gumbel": bn.gumbel_init(k2, self.hid, self.k, self.slices),
            "wavenet": self.wavenet.init(k3),
        }, {}

    def encode(self, params, state, c, tar_c=None, dtype=None, rng=None):
        z = self.make_encoder().apply(params["encoder"], c, dtype=dtype)
        q, _l, _p, _idx = bn.gumbel_apply(
            params["gumbel"], z, rng, tau=self.tau, hard=self.hard, train=False
        )
        return q

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None):
        z = self.make_encoder().apply(params["encoder"], c, dtype=dtype)
        rng, sk = jax.random.split(rng)
        q, aux, perp, _idx = bn.gumbel_apply(
            params["gumbel"], z, sk, tau=self.tau, hard=self.hard, train=train
        )
        y_hat = self._decoder_forward(params, x, q, g, rng, train, dtype)
        return y_hat, aux, perp, state


# ---------------------------------------------------------------------------
# Plain vocoder (no encoder): name == "wavenet_vocoder"
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Vocoder:
    wavenet: WaveNet

    def init(self, key):
        return {"wavenet": self.wavenet.init(key)}, {}

    def encode(self, params, state, c, tar_c=None, dtype=None):
        return c

    def forward(self, params, state, rng, x, c, g, train=True, dtype=None):
        y_hat = self.wavenet.apply(params["wavenet"], x, c, g, rng=rng, train=train, dtype=dtype)
        return y_hat, jnp.float32(0.0), jnp.float32(0.0), state

    def decode(self, params, key, c, g=None, T=None, state=None, tar_c=None, **kw):
        if T is None:
            import numpy as np

            T = (c.shape[1] - 2 * self.wavenet.cin_pad) * int(
                np.prod(self.wavenet.upsample_scales)
            )
        return self.wavenet.decode(params["wavenet"], key, T, c=c, g=g, **kw)
