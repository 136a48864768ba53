"""Careful TPU timing calibration: per-call block_until_ready, separate
compile vs steady-state, small/mid/large programs. Run on the real chip."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def timed(name, fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{name}: compile {compile_s:.1f}s steady {np.median(times)*1e3:.2f}ms "
          f"(min {min(times)*1e3:.2f})", flush=True)
    return np.median(times)


def main():
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    # 1. trivial
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    f1 = jax.jit(lambda a: (a @ a).sum())
    timed("matmul1024", f1, x)

    # 2. the GLU stack fwd (teacher-forced), svqwae shapes, batch 40
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
                                         train=False, dtype=jnp.bfloat16)[0]
    )
    t_fwd = timed("svqwae_fwd_B40_T5120", fwd, params, xb, cb, gb)
    flops = 2 * B * T * (3 * 256 * 368 + 184 * (256 + 256) + 64 * 368 + 2 * 256 * 256) * 20 / 20
    # per-layer dominant conv flops x 20 layers:
    flops = 2 * B * T * 20 * (3 * 256 * 368 + 184 * 512 + 64 * 368)
    print(f"  fwd ~{flops/1e12:.2f} TFLOP -> {flops/t_fwd/1e12:.1f} TFLOP/s", flush=True)

    # 3. train step
    from wavenet_autoencoders_tpu.train.step import init_state, make_train_step

    st = init_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, donate=False)
    batch = {
        "x": rng.integers(0, 256, (B, T)).astype(np.int32),
        "y": rng.integers(0, 256, (B, T, 1)).astype(np.int32),
        "c": np.asarray(cb), "g": np.asarray(gb),
        "lengths": np.full((B,), T, np.int32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    def stepfn(s, b):
        return step(s, b, jax.random.PRNGKey(1))

    t0 = time.perf_counter()
    s2, m = stepfn(st, batch)
    jax.block_until_ready(m["loss"])
    print(f"train_step compile {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s2, m = stepfn(s2, batch)
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    tstep = np.median(times)
    print(f"train_step steady {tstep*1e3:.1f}ms -> {B*T/tstep:,.0f} samples/s", flush=True)

    # 4. scan decode, small T first then full
    for Bs, Td in [(16, 640), (16, 5120)]:
        lat = jnp.asarray(rng.standard_normal((Bs, Td // 640, 64)), jnp.float32)
        g = jnp.asarray(np.arange(Bs) % cfg.n_speakers, jnp.int32)
        dec = jax.jit(
            lambda p, k, c, g, T=Td: model.wavenet.decode(
                p["wavenet"], k, T, c=c, g=g, log_scale_min=cfg.log_scale_min
            )
        )
        key = jax.random.PRNGKey(5)
        t0 = time.perf_counter()
        y = dec(params, key, lat, g)
        jax.block_until_ready(y)
        print(f"decode B{Bs} T{Td} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            y = dec(params, jax.random.fold_in(key, i), lat, g)
            jax.block_until_ready(y)
            times.append(time.perf_counter() - t0)
        td = np.median(times)
        print(f"decode steady {td*1e3:.1f}ms -> {Bs*Td/td:,.0f} samples/s "
              f"= {Bs*Td/16000/td:.2f} audio-sec/s  ({td/Td*1e6:.0f}us/step)", flush=True)


if __name__ == "__main__":
    main()
