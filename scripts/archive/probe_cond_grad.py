"""Conditioning-wiring gradient probe (30 s, CPU).

Computes d(recon_loss)/d(c) through the EXACT training loss
(train/step.py loss_fn semantics) at a given checkpoint (or fresh init).
A connected conditioning path gives a healthy gradient norm; a severed
path (upsampler mis-wiring, latent dropped, misalignment to a region the
loss masks out) gives ~0. Also reports d(recon)/d(encoder params) — the
signal that keeps the bottleneck alive — separately from the commitment
gradient.

Usage: python scripts/probe_cond_grad.py <exp_dir> [ckpt.npz]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.cli.main import _load_model
from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.data.dataset import WaveDataset, data_iterator
from wavenet_autoencoders_tpu.ops.losses import sequence_mask
from wavenet_autoencoders_tpu.train.step import _prep_x, _recon_loss


def main():
    os.chdir("/root/repo/quality")
    exp = Path(sys.argv[1])
    cfg = Config.load(exp / "config.json")
    if len(sys.argv) > 2:
        model, params, mstate = _load_model(cfg, sys.argv[2], use_ema=False)
    else:
        from wavenet_autoencoders_tpu.models.zoo import build_model
        model = build_model(cfg)
        params, mstate = model.init(jax.random.PRNGKey(0))
        print("fresh init")

    ds = WaveDataset("dump/2019/english/dev", cfg, feat_type="mfcc")
    batch = next(iter(data_iterator(ds, cfg, batch_size=8, prefetch=0, epochs=1)))

    def recon_of_c(c):
        x = _prep_x(cfg, batch["x"])
        y_hat, aux, perp, _ = model.forward(
            params, mstate, jax.random.PRNGKey(0), x, c, batch.get("g"),
            train=True, dtype=None,
        )
        mask = sequence_mask(batch["lengths"], x.shape[1])[..., None]
        return _recon_loss(cfg, y_hat.astype(jnp.float32), batch["y"], mask)

    def recon_of_enc(enc_params):
        p = dict(params)
        p["encoder"] = enc_params
        x = _prep_x(cfg, batch["x"])
        y_hat, aux, perp, _ = model.forward(
            p, mstate, jax.random.PRNGKey(0), x, batch["c"], batch.get("g"),
            train=True, dtype=None,
        )
        mask = sequence_mask(batch["lengths"], x.shape[1])[..., None]
        return _recon_loss(cfg, y_hat.astype(jnp.float32), batch["y"], mask)

    c = jnp.asarray(batch["c"])
    loss, gc = jax.value_and_grad(recon_of_c)(c)
    print(f"recon loss: {float(loss):.4f}")
    print(f"||d recon / d c||: {float(jnp.linalg.norm(gc)):.3e}  "
          f"(per-elem rms {float(jnp.sqrt(jnp.mean(gc**2))):.3e})")

    ge = jax.grad(recon_of_enc)(params["encoder"])
    norms = jax.tree.map(lambda a: float(jnp.linalg.norm(a)), ge)
    total = float(
        jnp.sqrt(sum(jnp.sum(jnp.asarray(v) ** 2) for v in jax.tree.leaves(ge))))
    print(f"||d recon / d encoder params||: {total:.3e}")
    leaves = jax.tree.leaves_with_path(ge)
    flat = sorted(
        ((jax.tree_util.keystr(k), float(jnp.linalg.norm(v))) for k, v in leaves),
        key=lambda t: -t[1])[:5]
    for k, v in flat:
        print(f"   {k}: {v:.3e}")


if __name__ == "__main__":
    main()
