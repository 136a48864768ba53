"""Round-2 MFU investigation: break the 236 ms train step into parts.

Times (on the real chip, chained-dependence + one forced sync):
  1. full train step (reference point)
  2. model fwd only
  3. fwd + loss
  4. fwd + loss + grad (no optimizer)
  5. isolated 20-layer GLU stack: fwd, fwd+bwd — XLA conv path
  6. same stack with the dilated conv written as 3 shifted GEMMs
  7. single-layer conv formulations head-to-head
"""
from __future__ import annotations

import math
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
from wavenet_autoencoders_tpu.train.step import init_state, make_train_step


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, n=10, trials=3):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        o = None
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
    batch = {k: jax.device_put(v, dev) for k, v in batch.items()}

    dt = timeit(step_fn, state, batch, jax.random.PRNGKey(1))
    print(f"full train step:      {dt*1e3:8.1f} ms")

    # --- forward only (model.forward incl. encoder+VQ+wavenet) ---
    @jax.jit
    def fwd(params, mstate, batch):
        out = model.forward(
            params, mstate, jax.random.PRNGKey(0),
            batch["x"], batch["c"], batch["g"], train=True, dtype=jnp.bfloat16,
        )
        return out[0].sum()

    dt = timeit(fwd, state.params, state.model_state, batch)
    print(f"model fwd only:       {dt*1e3:8.1f} ms")

    # --- fwd+grad of scalar loss ---
    @jax.jit
    def fwdbwd(params, mstate, batch):
        def loss_fn(p):
            out = model.forward(
                p, mstate, jax.random.PRNGKey(0),
                batch["x"], batch["c"], batch["g"], train=True, dtype=jnp.bfloat16,
            )
            return out[0].astype(jnp.float32).sum() + out[1].sum()
        return jax.grad(loss_fn)(params)

    dt = timeit(fwdbwd, state.params, state.model_state, batch)
    print(f"fwd + grad (sum loss):{dt*1e3:8.1f} ms")

    # --- isolated GLU stack ---
    C, G, S, L = 256, cfg.gate_channels, 256, cfg.layers
    G2 = G // 2
    cin = cfg.cin_channels
    k = np.random.default_rng(1)
    bf = jnp.bfloat16
    h0 = jnp.asarray(k.standard_normal((B, T, C)) * 0.1, bf)
    cc = jnp.asarray(k.standard_normal((B, T, cin)) * 0.1, bf)
    dil = [2 ** (i % 10) for i in range(L)]
    Ws = []
    for i in range(L):
        Ws.append(dict(
            wconv=jnp.asarray(k.standard_normal((3, C, G)) * 0.05, bf),
            bconv=jnp.zeros((G,), jnp.float32),
            wc=jnp.asarray(k.standard_normal((cin, G)) * 0.05, bf),
            wout=jnp.asarray(k.standard_normal((G2, C)) * 0.05, bf),
            bout=jnp.zeros((C,), jnp.float32),
            wskip=jnp.asarray(k.standard_normal((G2, S)) * 0.05, bf),
            bskip=jnp.zeros((S,), jnp.float32),
        ))

    def stack_conv(ws, h, cc):
        skips = jnp.zeros((B, T, S), jnp.float32)
        for i, w in enumerate(ws):
            d = dil[i]
            wconv = w["wconv"].transpose(0, 1, 2)  # (3, C, G) WIO
            pad = jnp.pad(h, ((0, 0), (2 * d, 0), (0, 0)))
            ab = jax.lax.conv_general_dilated(
                pad, wconv, (1,), [(0, 0)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + w["bconv"].astype(bf)
            ab = ab + cc @ w["wc"]
            act = jnp.tanh(ab[..., :G2]) * jax.nn.sigmoid(ab[..., G2:])
            skips = skips + (act @ w["wskip"]).astype(jnp.float32)
            h = ((act @ w["wout"] + w["bout"].astype(bf)) + h) * jnp.asarray(
                math.sqrt(0.5), bf)
        return h, skips

    def stack_gemm(ws, h, cc):
        skips = jnp.zeros((B, T, S), jnp.float32)
        for i, w in enumerate(ws):
            d = dil[i]
            pad = jnp.pad(h, ((0, 0), (2 * d, 0), (0, 0)))
            ab = (
                pad[:, 0:T] @ w["wconv"][0]
                + pad[:, d:d + T] @ w["wconv"][1]
                + pad[:, 2 * d:2 * d + T] @ w["wconv"][2]
                + w["bconv"].astype(bf)
            )
            ab = ab + cc @ w["wc"]
            act = jnp.tanh(ab[..., :G2]) * jax.nn.sigmoid(ab[..., G2:])
            skips = skips + (act @ w["wskip"]).astype(jnp.float32)
            h = ((act @ w["wout"] + w["bout"].astype(bf)) + h) * jnp.asarray(
                math.sqrt(0.5), bf)
        return h, skips

    for name, f in [("conv_general", stack_conv), ("3-shift GEMM", stack_gemm)]:
        jf = jax.jit(lambda ws, h, c, f=f: f(ws, h, c)[1].sum())
        dt = timeit(jf, Ws, h0, cc)
        print(f"stack fwd  [{name}]: {dt*1e3:8.1f} ms")

        def lossf(ws, h, c, f=f):
            o, s = f(ws, h, c)
            return s.sum() + o.astype(jnp.float32).sum()
        jg = jax.jit(lambda ws, h, c, lf=lossf: jax.grad(lf)(ws, h, c))
        dt = timeit(jg, Ws, h0, cc)
        print(f"stack f+b  [{name}]: {dt*1e3:8.1f} ms")

    # FLOP model
    flops_l = 2 * B * T * (3 * C * G + cin * G + G2 * C + G2 * S)
    print(f"\nper-stack fwd GFLOP: {L * flops_l / 1e9:.1f}")


if __name__ == "__main__":
    main()
