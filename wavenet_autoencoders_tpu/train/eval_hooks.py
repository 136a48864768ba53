"""Training-time qualitative evaluation hooks.

Replaces ``save_states`` (teacher-forced sample dump,
``vqwae_train.py:643-691``) and ``eval_model`` (full AR decode of a dev
utterance to wav + waveform plot, ``vqwae_train.py:572-640``). Waveform
plots are written when matplotlib is importable, else skipped.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu import dsp


def _to_wav(cfg: Config, codes_or_scalar: np.ndarray) -> np.ndarray:
    mu = cfg.quantize_channels - 1
    if cfg.is_mulaw_quantize:
        y = dsp.inv_mulaw_quantize(codes_or_scalar.astype(np.float32), mu)
    elif cfg.is_mulaw:
        y = dsp.inv_mulaw(codes_or_scalar, mu)
    else:
        y = codes_or_scalar
    return np.asarray(y, np.float32)


def _save_plot(path, y_hat, y_target, sr):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    t = np.arange(len(y_target)) / sr
    fig, axes = plt.subplots(2, 1, figsize=(16, 6), sharex=True)
    axes[0].plot(t[: len(y_target)], y_target)
    axes[0].set_title("target")
    axes[1].plot(np.arange(len(y_hat)) / sr, y_hat)
    axes[1].set_title("predicted")
    fig.tight_layout()
    fig.savefig(path, format="png")
    plt.close(fig)


def save_states(cfg: Config, step: int, y_hat_logits, batch, checkpoint_dir):
    """Teacher-forced sample dump: argmax/sample the train-step outputs of
    one random batch item and write predicted/target wavs
    (``vqwae_train.py:643-691``)."""
    out_dir = Path(checkpoint_dir) / "intermediate" / "audio"
    out_dir.mkdir(parents=True, exist_ok=True)
    # deterministic item pick: seeded by (cfg.seed, step) so reruns dump
    # the same utterance (the reference used unseeded randint)
    idx = int(np.random.default_rng(cfg.seed + step).integers(0, y_hat_logits.shape[0]))
    length = int(batch["lengths"][idx])

    y_hat = np.asarray(y_hat_logits[idx])
    if cfg.is_mulaw_quantize:
        pred = y_hat.argmax(axis=-1)
        target = np.asarray(batch["y"][idx, :, 0])
    else:
        from wavenet_autoencoders_tpu.ops.mixture import (
            sample_from_discretized_mix_logistic,
            sample_from_mix_gaussian,
        )

        smp = (
            sample_from_discretized_mix_logistic
            if cfg.output_distribution == "Logistic"
            else sample_from_mix_gaussian
        )
        pred = np.asarray(
            smp(jax.random.PRNGKey(step), jnp.asarray(y_hat[None]), log_scale_min=cfg.log_scale_min)
        )[0]
        target = np.asarray(batch["y"][idx, :, 0])
    pred_w = _to_wav(cfg, pred)
    tgt_w = _to_wav(cfg, target)
    pred_w[length:] = 0
    tgt_w[length:] = 0
    dsp.save_wav(pred_w, out_dir / f"step{step:09d}_predicted.wav", cfg.sample_rate)
    dsp.save_wav(tgt_w, out_dir / f"step{step:09d}_target.wav", cfg.sample_rate)


def eval_model(cfg: Config, model, params, state, step: int, batch, eval_dir, key=None):
    """Full AR decode of one batch item conditioned on its features, wav +
    waveplot out (``vqwae_train.py:572-640``). Uses EMA params when the
    caller passes them."""
    out_dir = Path(eval_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idx = int(np.random.default_rng(cfg.seed + step).integers(0, batch["c"].shape[0]))
    c = np.asarray(batch["c"][idx : idx + 1])
    g = None
    if "g" in batch:
        g = np.asarray(batch["g"][idx : idx + 1])
    key = jax.random.PRNGKey(cfg.seed + step) if key is None else key

    from wavenet_autoencoders_tpu.eval.synthesize import batch_wavegen

    wav = batch_wavegen(cfg, model, params, state, c, g, key=key)[0]
    target = _to_wav(cfg, np.asarray(batch["y"][idx, :, 0]))
    dsp.save_wav(wav.copy(), out_dir / f"step{step:09d}_predicted.wav", cfg.sample_rate)
    dsp.save_wav(target.copy(), out_dir / f"step{step:09d}_target.wav", cfg.sample_rate)
    _save_plot(out_dir / f"step{step:09d}_waveplots.png", wav, target, cfg.sample_rate)
