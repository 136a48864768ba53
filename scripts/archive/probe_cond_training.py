"""Conditioning-wiring microtest: can training exploit c at all?

Builds a synthetic task where the mu-law target at every timestep is a
function of the conditioning features ONLY (constant within each hop-sized
frame, drawn iid per frame, value announced in c) and the waveform past is
USELESS (iid frames). A correctly wired model family drives CE -> ~0;
a broken training-time conditioning path is pinned at the unconditional
frame entropy (log of the alphabet).

Runs the REAL train step (train/step.py) on a tiny svqwae-family config,
CPU by default. ~2 min.

Usage: python scripts/probe_cond_training.py [n_steps]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.models.zoo import build_model
from wavenet_autoencoders_tpu.train.step import init_state, make_train_step

N_LEVELS = 8          # distinct mu-law symbols in play
HOP = 160
FRAMES = 16           # frames per crop -> T = 2560
B = 8


def make_batch(rng: np.random.Generator, cfg):
    """Frame-constant random symbols; c carries the symbol one-hot (and
    zeros elsewhere of the cin_channels width)."""
    T = HOP * FRAMES
    sym = rng.integers(0, N_LEVELS, (B, FRAMES))
    # spread the N levels across the mu-law alphabet
    levels = (np.arange(N_LEVELS) * (cfg.quantize_channels // N_LEVELS)
              + cfg.quantize_channels // (2 * N_LEVELS))
    y = levels[sym]                              # (B, FRAMES)
    y = np.repeat(y, HOP, axis=1)[..., None]     # (B, T, 1)
    c = np.zeros((B, FRAMES, cfg.cin_channels), np.float32)
    c[np.arange(B)[:, None], np.arange(FRAMES)[None, :], sym] = 1.0
    x = np.eye(cfg.quantize_channels, dtype=np.float32)[y[..., 0]]  # one-hot input
    return {
        "x": x, "y": y.astype(np.int32), "c": c,
        "g": np.zeros(B, np.int32),
        "lengths": np.full(B, T, np.int32),
    }


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    cfg = load_preset(
        "svqwae",
        "layers=4,stacks=1,residual_channels=32,gate_channels=32,"
        "skip_out_channels=32,encoder_hid=32,cin_channels=%d,"
        "upsample_conditional_features=true,"
        'upsample_scales=[4,4,10],'
        "batch_size=%d,sample_size=%d,time_jitter=false,"
        'optimizer_params={"lr": 3e-3, "eps": 1e-8, "weight_decay": 0.0}'
        % (N_LEVELS, B, HOP * FRAMES),
    )
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(cfg, model, donate=False))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    uncond_floor = float(np.log(N_LEVELS))
    print(f"unconditional frame entropy: {uncond_floor:.4f} nats")
    for i in range(n_steps):
        batch = make_batch(rng, cfg)
        state, m = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()}, key)
        if i % 25 == 0 or i == n_steps - 1:
            print(f"step {i}: recon {float(m['recon_loss']):.4f} "
                  f"aux {float(m['aux_loss']):.4f} perp {float(m['perplexity']):.1f}",
                  flush=True)
    # Verdict on FRAME-BOUNDARY samples only: within a frame the target is
    # constant, so an unconditional AR model reaches mean CE ~= log(N)/HOP
    # by copying the previous sample — the all-positions average can never
    # expose a severed conditioning path. At t = k*HOP the new frame's
    # symbol is iid, the past is useless, and only c carries the answer:
    # broken conditioning is pinned at log(N) there, working conditioning
    # drives it toward 0.
    batch = make_batch(rng, cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    y_hat, *_ = model.forward(
        state.params, state.model_state, key, jb["x"], jb["c"], jb["g"], train=False
    )
    logp = jax.nn.log_softmax(np.asarray(y_hat, np.float32), axis=-1)
    bounds = np.arange(1, FRAMES) * HOP          # y[t] predicted from y_hat[t-1]
    tgt = batch["y"][:, bounds, 0]               # (B, FRAMES-1)
    ce_b = -np.mean(
        np.take_along_axis(logp[:, bounds - 1], tgt[..., None], axis=-1)
    )
    print(f"frame-boundary CE: {ce_b:.4f} nats (unconditional floor "
          f"{uncond_floor:.4f}, copy-previous baseline ~{uncond_floor/HOP:.4f} "
          f"all-positions)")
    verdict = ("PASS: conditioning path trains (boundary CE well below the "
               "unconditional floor)"
               if ce_b < 0.5 * uncond_floor else
               "FAIL: boundary CE pinned at the unconditional floor -> "
               "conditioning unused by training")
    print(verdict)
    sys.exit(0 if ce_b < 0.5 * uncond_floor else 1)


if __name__ == "__main__":
    main()
