"""WaveNet AR decoder — teacher-forced batch forward + on-device AR decode.

Re-design of ``wavenet_vocoder/wavenet.py`` for TPU:

- teacher-forced ``apply``: the full dilated-GLU stack over (B, T, C),
  all convs lowered to MXU matmuls, channels-last.
- ``decode``: the reference's per-sample Python loop
  (``wavenet.py:299-339``) becomes a single ``lax.scan`` over T whose body
  does one fused network step with O(1) circular buffers per layer
  (see ops.modules.residual_glu_step) and the sampling RNG *inside* the
  step — zero host↔device traffic during generation, and B utterances
  decode in parallel to fill the MXU.

Static architecture lives on the (hashable) ``WaveNet`` instance; learnable
state is an explicit params pytree: {'first', 'layers': [...], 'post1',
'post2', 'embed'?, 'upsample'?}.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from wavenet_autoencoders_tpu.ops.conv import (
    conv1d_apply,
    conv1d_init,
    receptive_field_size,
)
from wavenet_autoencoders_tpu.ops.mixture import (
    sample_from_discretized_mix_logistic,
    sample_from_mix_gaussian,
)
from wavenet_autoencoders_tpu.ops.modules import (
    embedding_init,
    glu_buffer_len,
    residual_glu_apply,
    residual_glu_init,
    residual_glu_step,
)
from wavenet_autoencoders_tpu.ops.upsample import (
    conv_in_upsample_apply,
    conv_in_upsample_init,
    upsample_network_apply,
    upsample_network_init,
)


@dataclass(frozen=True)
class WaveNet:
    """Architecture description (mirrors ``wavenet.py:98-111`` kwargs)."""

    out_channels: int = 256
    layers: int = 20
    stacks: int = 2
    residual_channels: int = 512
    gate_channels: int = 512
    skip_out_channels: int = 512
    kernel_size: int = 3
    dropout: float = 0.05
    cin_channels: int = -1
    gin_channels: int = -1
    n_speakers: int | None = None
    upsample_conditional_features: bool = False
    upsample_net: str = "ConvInUpsampleNetwork"
    upsample_scales: tuple = (4, 4, 4, 4)
    freq_axis_kernel_size: int = 1
    cin_pad: int = 0
    scalar_input: bool = False
    use_speaker_embedding: bool = False
    output_distribution: str = "Logistic"
    # experimental: whole-stack fused Pallas fwd+bwd (kernels/glu_stack.py)
    # with explicit VJP; requires dropout == 0 and kernel_size == 3.
    # Default OFF — measured slower than XLA's own fusion (see README
    # "Deliberate deviations"); the plain-JAX path is the production path.
    fused_stack: bool = False

    # ---- derived ----
    @property
    def layers_per_stack(self) -> int:
        assert self.layers % self.stacks == 0
        return self.layers // self.stacks

    def dilation(self, layer: int) -> int:
        return 2 ** (layer % self.layers_per_stack)

    @property
    def receptive_field(self) -> int:
        return receptive_field_size(self.layers, self.stacks, self.kernel_size)

    @property
    def in_channels(self) -> int:
        return 1 if self.scalar_input else self.out_channels

    def has_speaker_embedding(self) -> bool:
        return self.gin_channels > 0 and self.use_speaker_embedding

    def local_conditioning_enabled(self) -> bool:
        return self.cin_channels > 0

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        ks = jax.random.split(key, self.layers + 5)
        p = {
            "first": conv1d_init(ks[0], self.in_channels, self.residual_channels, 1),
            "layers": [
                residual_glu_init(
                    ks[1 + i],
                    self.residual_channels,
                    self.gate_channels,
                    self.kernel_size,
                    skip_out_channels=self.skip_out_channels,
                    cin_channels=self.cin_channels,
                    gin_channels=self.gin_channels,
                )
                for i in range(self.layers)
            ],
            "post1": conv1d_init(
                ks[self.layers + 1], self.skip_out_channels, self.skip_out_channels, 1
            ),
            "post2": conv1d_init(
                ks[self.layers + 2], self.skip_out_channels, self.out_channels, 1
            ),
        }
        if self.has_speaker_embedding():
            assert self.n_speakers is not None
            # std=0.1 as in wavenet.py:145-146
            p["embed"] = embedding_init(ks[self.layers + 3], self.n_speakers, self.gin_channels, std=0.1)
        if self.upsample_conditional_features:
            if self.upsample_net == "ConvInUpsampleNetwork":
                p["upsample"] = conv_in_upsample_init(
                    ks[self.layers + 4],
                    self.cin_channels,
                    self.cin_pad,
                    self.upsample_scales,
                    self.freq_axis_kernel_size,
                )
            else:
                p["upsample"] = upsample_network_init(
                    ks[self.layers + 4], self.upsample_scales, self.freq_axis_kernel_size
                )
        return p

    # ------------------------------------------------------------------
    def _global_features(self, params, g):
        """Speaker ids (B,) -> (B, gin) via embedding, or pass through
        continuous global features (B, gin) (``wavenet.py:185-194``)."""
        if g is None:
            return None
        if self.has_speaker_embedding():
            table = params["embed"]["table"]
            return jnp.take(table, g.reshape(-1), axis=0)
        if g.ndim == 3:  # (B, C, 1) channel-first edge case
            g = g[:, :, 0]
        return g

    def upsample_conditioning(self, params, c, dtype=None):
        """(B, T', cin) frame-rate conditioning -> (B, T, cin) sample-rate."""
        if c is None or not self.upsample_conditional_features:
            return c
        if self.upsample_net == "ConvInUpsampleNetwork":
            return conv_in_upsample_apply(
                params["upsample"], c, self.upsample_scales, self.freq_axis_kernel_size, dtype=dtype
            )
        return upsample_network_apply(
            params["upsample"],
            c,
            self.upsample_scales,
            self.freq_axis_kernel_size,
            cin_pad=self.cin_pad,
            dtype=dtype,
        )

    def _align_conditioning(self, params, c, T, dtype=None, upsampled=False):
        """Bring conditioning to sample rate (length T).

        With an upsample net this is the learned upsampler; without one the
        reference repeats each frame ``up_factor`` times on the host
        (``synthesis.py:335-339`` and ``audio.adjust_time_resolution`` in
        the training collate, ``vqwae_train.py:481``) — here the repeat is
        an on-device ``jnp.repeat`` so both train and decode work with
        ``upsample_conditional_features=false``."""
        if c is None:
            return None
        if not upsampled:
            c = self.upsample_conditioning(params, c, dtype=dtype)
        if not self.upsample_conditional_features and c.shape[1] != T:
            assert T % c.shape[1] == 0, (
                f"T={T} is not a multiple of conditioning frames {c.shape[1]} "
                "(no-upsampler repeat path)"
            )
            c = jnp.repeat(c, T // c.shape[1], axis=1)
        assert c.shape[1] == T, f"conditioning {c.shape} vs T={T}"
        return c

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        c: jnp.ndarray | None = None,
        g: jnp.ndarray | None = None,
        *,
        softmax: bool = False,
        rng=None,
        train: bool = False,
        dtype=None,
        upsampled: bool = False,
    ) -> jnp.ndarray:
        """Teacher-forced forward (``wavenet.py:164-216``).

        x: (B, T, in_channels) one-hot or (B, T, 1) scalar input.
        c: (B, T', cin) conditioning at frame rate (upsampled internally
           unless ``upsampled``).
        g: (B,) int speaker ids or (B, gin) features.
        Returns logits/params (B, T, out_channels).
        """
        B, T = x.shape[0], x.shape[1]
        g_feat = self._global_features(params, g)
        c = self._align_conditioning(params, c, T, dtype=dtype, upsampled=upsampled)

        if x.ndim == 2 and jnp.issubdtype(x.dtype, jnp.integer):
            # integer-code fast path: the first 1x1 over a one-hot input is
            # a row gather — skips materializing the (B, T, 256) one-hot
            from wavenet_autoencoders_tpu.ops.conv import conv1d_weight

            w1 = conv1d_weight(params["first"], dtype)[0]
            h = jnp.take(w1, x, axis=0) + params["first"]["b"]
        else:
            h = conv1d_apply(params["first"], x, dtype=dtype)
        if self.fused_stack and self.kernel_size == 3 and self.dropout == 0.0:
            # ONE Pallas kernel for all layers, h VMEM-resident; backward
            # reconstructs activations from the saved pre-activations
            # (kernels/glu_stack.py)
            from wavenet_autoencoders_tpu.kernels.glu_stack import fused_glu_stack
            from wavenet_autoencoders_tpu.ops.conv import conv1d_weight

            interp = jax.devices()[0].platform == "cpu"
            if dtype is not None:
                h = h.astype(dtype)
                c = None if c is None else c.astype(dtype)
            lps = params["layers"]
            wconv = jnp.stack([conv1d_weight(lp["conv"], dtype) for lp in lps])
            bconv = jnp.stack([lp["conv"]["b"] for lp in lps])
            wc = (
                jnp.stack([conv1d_weight(lp["cproj"], dtype)[0] for lp in lps])
                if c is not None else None
            )
            wout = jnp.stack([conv1d_weight(lp["out"], dtype)[0] for lp in lps])
            bout = jnp.stack([lp["out"]["b"] for lp in lps])
            wskip = jnp.stack([conv1d_weight(lp["skip"], dtype)[0] for lp in lps])
            bskip = jnp.stack([lp["skip"]["b"] for lp in lps])
            g_adds = None
            if g_feat is not None and "gproj" in lps[0]:
                g_adds = jnp.stack(
                    [
                        jnp.einsum("bj,jg->bg", g_feat, conv1d_weight(lp["gproj"], dtype)[0])
                        for lp in lps
                    ],
                    axis=1,
                )  # (B, L, G)
            dils = tuple(self.dilation(i) for i in range(self.layers))
            skips = fused_glu_stack(
                h, c, g_adds, wconv, bconv, wc, wout, bout, wskip, bskip,
                dils, interp,
            ).astype(jnp.float32)
        else:
            skips = 0.0
            for i, lp in enumerate(params["layers"]):
                if train and self.dropout > 0.0 and rng is not None:
                    rng, sub = jax.random.split(rng)
                else:
                    sub = None
                h, s = residual_glu_apply(
                    lp,
                    h,
                    c,
                    g_feat,
                    dilation=self.dilation(i),
                    dropout=self.dropout if train else 0.0,
                    rng=sub,
                    dtype=dtype,
                )
                skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)

        out = jax.nn.relu(skips)
        out = conv1d_apply(params["post1"], out, dtype=dtype)
        out = jax.nn.relu(out)
        out = conv1d_apply(params["post2"], out, dtype=dtype)
        if softmax:
            out = jax.nn.softmax(out, axis=-1)
        return out

    # ------------------------------------------------------------------
    # AR decoding
    # ------------------------------------------------------------------
    def init_buffers(self, batch: int, dtype=jnp.float32) -> list:
        """Zeroed circular buffers, one per layer + one for the 1x1 convs
    (1x1s need no buffer). Layer i buffer: (B, (k-1)*d_i, residual)."""
        return [
            jnp.zeros(
                (batch, glu_buffer_len(self.kernel_size, self.dilation(i)), self.residual_channels),
                dtype,
            )
            for i in range(self.layers)
        ]

    def step(
        self,
        params: dict,
        x_t: jnp.ndarray,
        buffers: list,
        t: jnp.ndarray,
        ct: jnp.ndarray | None,
        g_feat: jnp.ndarray | None,
        dtype=None,
    ):
        """One network step: x_t (B, in_channels) -> logits (B, out), new
        buffers. Mirrors the per-step stack of ``wavenet.py:310-322``."""
        h = jnp.einsum(
            "bc,cd->bd",
            x_t,
            _fold_1x1(params["first"], dtype),
            preferred_element_type=jnp.float32,
        ) + params["first"]["b"]
        new_buffers = []
        skips = 0.0
        for i, lp in enumerate(params["layers"]):
            h, s, nb = residual_glu_step(
                lp,
                h,
                buffers[i],
                t,
                ct,
                g_feat,
                dilation=self.dilation(i),
                kernel_size=self.kernel_size,
                dtype=dtype,
            )
            new_buffers.append(nb)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)
        out = jax.nn.relu(skips)
        out = jnp.einsum(
            "bc,cd->bd", out, _fold_1x1(params["post1"], dtype), preferred_element_type=jnp.float32
        ) + params["post1"]["b"]
        out = jax.nn.relu(out)
        out = jnp.einsum(
            "bc,cd->bd", out, _fold_1x1(params["post2"], dtype), preferred_element_type=jnp.float32
        ) + params["post2"]["b"]
        return out, new_buffers

    def sample_output(self, key, logits, *, softmax=True, quantize=True, log_scale_min=-50.0):
        """Map one step's logits (B, out) to the next input + the recorded
        output (``wavenet.py:324-338``)."""
        if self.scalar_input:
            y = logits[:, None, :]  # (B, 1, C)
            if self.output_distribution == "Logistic":
                x = sample_from_discretized_mix_logistic(key, y, log_scale_min=log_scale_min)
            elif self.output_distribution == "Normal":
                x = sample_from_mix_gaussian(key, y, log_scale_min=log_scale_min)
            else:
                raise ValueError(self.output_distribution)
            return x.reshape(-1, 1)  # (B, 1) next scalar input & output
        probs = jax.nn.softmax(logits, axis=-1) if softmax else logits
        if quantize:
            idx = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-12)), axis=-1)
            return jax.nn.one_hot(idx, self.out_channels, dtype=logits.dtype)
        return probs

    def decode(
        self,
        params: dict,
        key,
        T: int,
        c: jnp.ndarray | None = None,
        g: jnp.ndarray | None = None,
        initial_input: jnp.ndarray | None = None,
        test_inputs: jnp.ndarray | None = None,
        *,
        softmax: bool = True,
        quantize: bool = True,
        log_scale_min: float = -50.0,
        dtype=None,
        upsampled: bool = False,
    ) -> jnp.ndarray:
        """Autoregressive generation (``wavenet.py:218-346``) as one
        ``lax.scan``; compiled once per (B, T) shape.

        c: (B, T', cin) frame conditioning (upsampled internally unless
        ``upsampled``); g: (B,) ids or (B, gin); test_inputs (B, T, C) runs
        the buffered path teacher-forced (the reference's debug hook and our
        equivalence test). Returns (B, T, out_channels) one-hot/probs, or
        (B, T, 1) scalar samples.
        """
        if c is not None:
            B = c.shape[0]
        elif test_inputs is not None:
            B = test_inputs.shape[0]
        elif initial_input is not None:
            B = initial_input.shape[0]
        else:
            B = 1
        g_feat = self._global_features(params, g)
        c = self._align_conditioning(params, c, T, dtype=dtype, upsampled=upsampled)

        if initial_input is None:
            if self.scalar_input:
                x0 = jnp.zeros((B, 1), jnp.float32)
            else:
                x0 = jax.nn.one_hot(
                    jnp.full((B,), 127, jnp.int32), self.out_channels
                )  # mu-law silence, wavenet.py:288
        else:
            x0 = initial_input.reshape(B, -1).astype(jnp.float32)

        buffers = self.init_buffers(B, jnp.float32 if dtype is None else dtype)

        c_s = None if c is None else jnp.swapaxes(c, 0, 1)  # (T, B, cin)
        ti_s = None if test_inputs is None else jnp.swapaxes(test_inputs, 0, 1)

        def body(carry, xs):
            x_t, bufs, k = carry
            t, ct, teach = xs
            if teach is not None:
                x_t = teach
            logits, bufs = self.step(params, x_t, bufs, t, ct, g_feat, dtype=dtype)
            k, sub = jax.random.split(k)
            out = self.sample_output(
                sub, logits, softmax=softmax, quantize=quantize, log_scale_min=log_scale_min
            )
            return (out.astype(x_t.dtype), bufs, k), out

        xs = (jnp.arange(T), c_s, ti_s)
        (_, _, _), ys = jax.lax.scan(body, (x0, buffers, key), xs, length=T)
        return jnp.swapaxes(ys, 0, 1)  # (B, T, C)


    def decode_pallas(
        self,
        params: dict,
        key,
        T: int,
        c: jnp.ndarray | None = None,
        g: jnp.ndarray | None = None,
        *,
        upsampled: bool = False,
        interpret: bool = False,
        dtype_str: str = "bfloat16",
        hbm_min_dilation: int | None | str = "auto",
    ):
        """Fused-kernel AR generation (kernels/decode.py): the whole
        sampling loop in one Pallas call with VMEM-resident weights.
        ``hbm_min_dilation="auto"`` spills high-dilation ring buffers to
        HBM (double-buffered prefetch) whenever the batch exceeds the
        all-VMEM ceiling of 32 — B=256 sustains ~248 audio-sec/s/chip on a
        v5e vs ~110 at the B=32 VMEM ceiling.
        Returns (codes (B,T) int32, logits (B,T,O)) for mu-law-quantize, or
        (samples (B,T) float in [-1,1], mixture params) for scalar input —
        in-kernel MoL/MoG sampling (reference wavenet.py:325-338)."""
        from wavenet_autoencoders_tpu.kernels.decode import (
            pack_decode_weights,
            precompute_g_add,
            wavenet_decode_pallas,
        )

        c = self._align_conditioning(params, c, T, upsampled=upsampled)
        if hbm_min_dilation == "auto":
            B = c.shape[0] if c is not None else 1
            big = max(self.dilation(i) for i in range(self.layers))
            hbm_min_dilation = 64 if (B > 32 and big >= 64) else None
        packed = pack_decode_weights(self, params)
        g_add = precompute_g_add(self, params, g)
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        return wavenet_decode_pallas(
            self, packed, T, seed, c_up=c, g_add=g_add, interpret=interpret,
            dtype_str=dtype_str, hbm_min_dilation=hbm_min_dilation,
        )


def _fold_1x1(p, dtype=None):
    from wavenet_autoencoders_tpu.ops.conv import conv1d_weight

    return conv1d_weight(p, dtype)[0]


def fold_weight_norm(params):
    """Fold every (g, v) weight-norm pair into a plain 'w' for inference —
    the reference's ``make_generation_fast_`` (``wavenet.py:358-364``)."""
    from wavenet_autoencoders_tpu.ops.conv import conv1d_weight

    def fold(p):
        if isinstance(p, dict):
            if "v" in p and "g" in p:
                q = {"w": conv1d_weight(p)}
                if "b" in p:
                    q["b"] = p["b"]
                return q
            return {k: fold(v) for k, v in p.items()}
        if isinstance(p, list):
            return [fold(v) for v in p]
        return p

    return fold(params)
