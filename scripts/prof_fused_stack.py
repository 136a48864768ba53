"""Measure the whole-stack fused GLU kernel (kernels/glu_stack.py) against
the XLA path on the real chip: full train step and isolated stack fwd/bwd,
at the flagship svqwae shapes (20L) and the quality-run shape (16L).

Run: timeout 540 python /root/repo/scripts/prof_fused_stack.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.models.zoo import build_model
from wavenet_autoencoders_tpu.train.step import init_state, make_train_step


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, n=10, trials=3):
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


def step_time(hp):
    cfg = load_preset("svqwae", "batch_size=40,compute_dtype=bfloat16," + hp)
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model, donate=False)
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
    dev = jax.devices()[0]
    batch = {k: jax.device_put(v, dev) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    def one(state):
        s, m = step_fn(state, batch, key)
        return m["loss"]

    # chained steps like bench.py
    st = state
    st, m = step_fn(st, batch, key)
    _sync(m["loss"])

    def chained():
        nonlocal st
        st2, m = step_fn(st, batch, key)
        st = st2
        return m["loss"]

    return timeit(lambda: chained(), n=10, trials=3)


def main():
    for layers, stacks in ((20, 2), (16, 2)):
        base = f"layers={layers},stacks={stacks}"
        t_plain = step_time(base)
        t_fused = step_time(base + ",fused_stack=true")
        print(
            f"L={layers}: plain {t_plain*1e3:.1f} ms/step   "
            f"fused_stack {t_fused*1e3:.1f} ms/step   "
            f"speedup x{t_plain/t_fused:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
