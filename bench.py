"""Benchmark harness — run on the real TPU chip.

Measures the two headline numbers BASELINE.md says must be established
(the reference publishes quality only; its AR loop is anecdotally minutes
per utterance):

1. teacher-forced training throughput, waveform samples/sec/chip, on the
   flagship SVQ-WAE at preset shapes (20 layers / 256 ch / 5120-sample
   crops, batch 40 — hps/vqwae.json schedule);
2. batched AR synthesis throughput, audio-seconds/sec/chip (jitted
   lax.scan decode, batch-parallel utterances).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

vs_baseline: the reference's synthesis loop runs its per-sample Python
loop at roughly 100-200 samples/sec on a GPU host (wavenet.py:299 —
~2 minutes per second of 16 kHz audio, widely reproduced for r9y9
wavenet_vocoder); we use 150 samples/sec => 0.009 audio-sec/s as the
baseline for the synthesis ratio, and report the ratio on the synthesis
metric.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# compiles through the axon tunnel are slow (~2 min each); persist them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

REF_SYNTH_AUDIO_SEC_PER_SEC = 150.0 / 16000.0  # reference AR python loop


def main():
    import jax

    from wavenet_autoencoders_tpu.config import load_preset
    from wavenet_autoencoders_tpu.models.zoo import build_model
    from wavenet_autoencoders_tpu.train.step import init_state, make_train_step

    dev = jax.devices()[0]
    platform = dev.platform

    cfg = load_preset("svqwae", "batch_size=40,compute_dtype=bfloat16")
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model)

    B, T = cfg.batch_size, cfg.max_time_steps
    frames = T // cfg.get_hop_size()
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.integers(0, cfg.quantize_channels, (B, T)).astype(np.int32),
        "y": rng.integers(0, cfg.quantize_channels, (B, T, 1)).astype(np.int32),
        "c": rng.standard_normal((B, frames, cfg.dim_in)).astype(np.float32),
        "g": (np.arange(B) % cfg.n_speakers).astype(np.int32),
        "lengths": np.full((B,), T, np.int32),
    }
    batch = {k: jax.device_put(v, dev) for k, v in batch.items()}

    # ---- train throughput ----
    state, m = step_fn(state, batch, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(m["loss"])
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step_fn(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    train_sps = B * T * n_steps / dt

    # ---- AR synthesis throughput ----
    from functools import partial

    params = state.params
    Bs, syn_frames = 16, 8  # 16 utterances x (8 latent frames * 640) samples
    lat = np.asarray(
        rng.standard_normal((Bs, syn_frames, cfg.cin_channels)), np.float32
    )
    g = (np.arange(Bs) % cfg.n_speakers).astype(np.int32)
    Ts = syn_frames * int(np.prod(cfg.upsample_scales))

    decode = jax.jit(
        lambda p, k, c, g: model.wavenet.decode(
            p["wavenet"], k, Ts, c=c, g=g, log_scale_min=cfg.log_scale_min,
            dtype=None,
        )
    )
    y = decode(params, jax.random.PRNGKey(2), lat, g)
    jax.block_until_ready(y)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        y = decode(params, jax.random.PRNGKey(3 + i), lat, g)
    jax.block_until_ready(y)
    dts = (time.perf_counter() - t0) / reps
    synth_audio_sec_per_sec = Bs * Ts / cfg.sample_rate / dts

    result = {
        "metric": "svqwae_train_samples_per_sec_per_chip",
        "value": round(train_sps, 1),
        "unit": "waveform samples/sec",
        "vs_baseline": round(synth_audio_sec_per_sec / REF_SYNTH_AUDIO_SEC_PER_SEC, 1),
        "extra": {
            "platform": platform,
            "train_batch": B,
            "train_crop": T,
            "train_steps_per_sec": round(n_steps / dt, 3),
            "synth_audio_sec_per_sec_per_chip": round(synth_audio_sec_per_sec, 3),
            "synth_batch": Bs,
            "synth_samples": Ts,
            "synth_samples_per_sec": round(Bs * Ts / dts, 1),
            "ref_synth_audio_sec_per_sec_assumed": REF_SYNTH_AUDIO_SEC_PER_SEC,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
