"""In-context ablation of the real train-step loss: swap parts out one at a
time, time jax.grad of the result, and attribute the 237 ms."""
from __future__ import annotations

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.models.zoo import build_model
from wavenet_autoencoders_tpu.ops import masked_cross_entropy, sequence_mask
from wavenet_autoencoders_tpu.train.step import init_state


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, n=5, trials=2):
    o = fn(*args)
    _sync(o)
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        _sync(o)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    dev = jax.devices()[0]
    cfg = load_preset("svqwae", "batch_size=40,compute_dtype=bfloat16")
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    net = model.wavenet
    bf = jnp.bfloat16

    B, T = cfg.batch_size, cfg.max_time_steps
    frames = T // cfg.get_hop_size()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 256, (B, T, 1)), jnp.int32)
    cfeat = jnp.asarray(rng.standard_normal((B, frames, cfg.dim_in)), jnp.float32)
    g = jnp.asarray(np.arange(B) % cfg.n_speakers, jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)

    def make_loss(ce=True, vq=True, ups=True, mask_on=True):
        def loss_fn(params, model_state, key):
            if vq:
                y_hat, aux, perp, _ = model.forward(
                    params, model_state, key, x, cfeat, g, train=True, dtype=bf
                )
            else:
                enc = model.make_encoder()
                z = enc.apply(params["encoder"], cfeat, dtype=bf)
                if ups:
                    y_hat = net.apply(params["wavenet"], x, z, g, dtype=bf)
                else:
                    c_up = jnp.ones((B, T, cfg.cin_channels), bf)
                    y_hat = net.apply(
                        params["wavenet"], x, c_up, g, dtype=bf, upsampled=True
                    )
                aux = jnp.float32(0.0)
            if ce:
                mask = sequence_mask(lengths, T)[..., None]
                if not mask_on:
                    mask = jnp.ones_like(mask)
                recon = masked_cross_entropy(
                    y_hat.astype(jnp.float32)[:, :-1], y[:, 1:], mask[:, 1:]
                )
            else:
                recon = y_hat.astype(jnp.float32).sum() * 1e-6
            return recon + aux

        return jax.jit(jax.grad(loss_fn))

    import sys
    which = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    key = jax.random.PRNGKey(1)
    for vi, (name, kw) in enumerate([
        ("full real loss           ", dict()),
        ("CE -> sum                ", dict(ce=False)),
        ("no VQ (enc direct)       ", dict(vq=False)),
        ("no VQ, CE->sum           ", dict(vq=False, ce=False)),
        ("no VQ, no upsample       ", dict(vq=False, ups=False)),
        ("no VQ, no ups, CE->sum   ", dict(vq=False, ups=False, ce=False)),
    ]):
        if which >= 0 and vi != which:
            continue
        f = make_loss(**kw)
        dt = timeit(f, state.params, state.model_state, key)
        print(f"{name}: {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
