"""TPU timing calibration with FORCED host synchronization.

On the experimental 'axon' platform, block_until_ready can return before
execution finishes; every measurement here pulls a scalar of the result to
host, which cannot complete early.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def sync(out):
    """Force completion: host-transfer one scalar from every output leaf."""
    leaves = jax.tree_util.tree_leaves(out)
    acc = 0.0
    for leaf in leaves[-1:]:
        acc += float(np.asarray(leaf).ravel()[0])
    return acc


def main():
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    x = jnp.ones((2048, 2048), jnp.bfloat16)
    f1 = jax.jit(lambda a: (a @ a).sum())
    sync(f1(x))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        sync(f1(x))
    per = (time.perf_counter() - t0) / reps
    print(f"matmul2048 {per*1e3:.3f}ms = {2*2048**3/per/1e12:.1f} TFLOP/s "
          f"(incl. host sync overhead)", flush=True)

    from wavenet_autoencoders_tpu.config import load_preset
    from wavenet_autoencoders_tpu.models.zoo import build_model

    cfg = load_preset("svqwae", "batch_size=40,compute_dtype=bfloat16")
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    B, T = 40, 5120
    frames = T // 160
    rng = np.random.default_rng(0)
    xb = jax.nn.one_hot(rng.integers(0, 256, (B, T)), 256, dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((B, frames, 39)), jnp.float32)
    gb = jnp.asarray(np.arange(B) % cfg.n_speakers, jnp.int32)

    fwd = jax.jit(
        lambda p, x, c, g: model.forward(p, state, jax.random.PRNGKey(1), x, c, g,
                                         train=False, dtype=jnp.bfloat16)[0].sum()
    )
    sync(fwd(params, xb, cb, gb))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(fwd(params, xb, cb, gb))
    t_fwd = (time.perf_counter() - t0) / 10
    flops = 2 * B * T * 20 * (3 * 256 * 368 + 184 * 512 + 64 * 368)
    print(f"svqwae fwd {t_fwd*1e3:.1f}ms ~{flops/1e12:.2f} TFLOP -> "
          f"{flops/t_fwd/1e12:.1f} TFLOP/s", flush=True)

    from wavenet_autoencoders_tpu.train.step import init_state, make_train_step

    st = init_state(cfg, model, jax.random.PRNGKey(0))
    for donate, tag in [(False, "nodonate"), (True, "donate")]:
        step = make_train_step(cfg, model, donate=donate)
        batch = {
            "x": rng.integers(0, 256, (B, T)).astype(np.int32),
            "y": rng.integers(0, 256, (B, T, 1)).astype(np.int32),
            "c": np.asarray(cb), "g": np.asarray(gb),
            "lengths": np.full((B,), T, np.int32),
        }
        batch = {k: jax.device_put(v) for k, v in batch.items()}
        s = jax.tree.map(jnp.copy, st)
        s, m = step(s, batch, jax.random.PRNGKey(1))
        sync(m["loss"])
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            s, m = step(s, batch, jax.random.PRNGKey(1))
            sync(m["loss"])
        tstep = (time.perf_counter() - t0) / n
        print(f"train_step[{tag}] {tstep*1e3:.1f}ms -> {B*T/tstep:,.0f} samples/s "
              f"-> {3*flops/tstep/1e12:.1f} TFLOP/s (fwd+bwd~3x)", flush=True)

    for Bs, Td in [(16, 5120), (64, 5120)]:
        lat = jnp.asarray(rng.standard_normal((Bs, Td // 640, 64)), jnp.float32)
        g = jnp.asarray(np.arange(Bs) % cfg.n_speakers, jnp.int32)
        dec = jax.jit(
            lambda p, k, c, g, T=Td: model.wavenet.decode(
                p["wavenet"], k, T, c=c, g=g, log_scale_min=cfg.log_scale_min
            ).sum()
        )
        key = jax.random.PRNGKey(5)
        sync(dec(params, key, lat, g))
        t0 = time.perf_counter()
        for i in range(3):
            sync(dec(params, jax.random.fold_in(key, i), lat, g))
        td = (time.perf_counter() - t0) / 3
        print(f"scan decode B{Bs} T{Td}: {td*1e3:.0f}ms -> "
              f"{Bs*Td/16000/td:.2f} audio-sec/s ({td/Td*1e6:.0f}us/step)", flush=True)


if __name__ == "__main__":
    main()
