"""Conditioning-ablation probe: does the decoder USE the encoder latents?

For a trained quality-run checkpoint, computes teacher-forced dev CE with
(a) the true conditioning features, (b) conditioning rolled across the
batch (each waveform paired with another utterance's features), and
(c) zeroed conditioning. A healthy autoencoder shows
CE(true) << CE(rolled) ~= CE(zero); a decoder that ignores its bottleneck
(the collapse mode diagnosed in QUALITY.md runs A-C) shows all three equal.

Distinguishes "conditioning channel broken/useless by construction" from
"optimization dynamics abandon it": run on an early checkpoint where the
exported codes are still phone-informative (ABX < chance).

Usage (cwd-independent; defaults to CPU so it can run beside a TPU
training job; set PROBE_TPU=1 to use the chip):
  python scripts/probe_conditioning.py <exp_dir> <ckpt.npz> [dev_dump_root]
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo/quality")

if not os.environ.get("PROBE_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

if not os.environ.get("PROBE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.cli.main import _load_model
from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.data.dataset import WaveDataset, data_iterator
from wavenet_autoencoders_tpu.ops.losses import sequence_mask
from wavenet_autoencoders_tpu.train.step import _prep_x, _recon_loss


def main():
    exp = Path(sys.argv[1])
    ckpt = sys.argv[2]
    dev_root = sys.argv[3] if len(sys.argv) > 3 else "dump/2019/english/dev"
    cfg = Config.load(exp / "config.json")
    # raw weights by default: at small step counts the 0.9999-decay EMA is
    # still dominated by the random init (0.9999^1000 = 0.90) and probes the
    # wrong model. PROBE_EMA=1 restores the EMA-sibling preference.
    model, params, mstate = _load_model(
        cfg, ckpt, use_ema=bool(os.environ.get("PROBE_EMA")))

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    @jax.jit
    def ce(batch, c):
        x = _prep_x(cfg, batch["x"])
        y_hat, aux, perp, _ = model.forward(
            params, mstate, jax.random.PRNGKey(0), x, c, batch.get("g"),
            train=False, dtype=dtype,
        )
        mask = sequence_mask(batch["lengths"], x.shape[1])[..., None]
        return _recon_loss(cfg, y_hat.astype(jnp.float32), batch["y"], mask), perp

    ds = WaveDataset(dev_root, cfg, feat_type="mfcc")
    acc = {"true": 0.0, "rolled": 0.0, "zero": 0.0}
    perp_acc, n = 0.0, 0
    max_batches = int(os.environ.get("PROBE_BATCHES", "3"))
    for bi, batch in enumerate(data_iterator(ds, cfg, batch_size=8, prefetch=0, epochs=1)):
        if bi >= max_batches:
            break
        c = batch["c"]
        variants = {
            "true": c,
            "rolled": np.roll(c, 1, axis=0),
            "zero": np.zeros_like(c),
        }
        for k, cv in variants.items():
            loss, perp = ce(batch, cv)
            acc[k] += float(loss)
            if k == "true":
                perp_acc += float(perp)
        n += 1
        print(f"batch {bi}: " + ", ".join(
            f"{k}={acc[k]/n:.4f}" for k in acc), flush=True)
    res = {k: round(v / n, 4) for k, v in acc.items()}
    res["perplexity_true"] = round(perp_acc / n, 2)
    res["ckpt"] = ckpt
    print(json.dumps(res))
    gain_rolled = res["rolled"] - res["true"]
    gain_zero = res["zero"] - res["true"]
    print(f"conditioning CE gain: vs rolled {gain_rolled:+.4f} nats, "
          f"vs zero {gain_zero:+.4f} nats")


if __name__ == "__main__":
    main()
