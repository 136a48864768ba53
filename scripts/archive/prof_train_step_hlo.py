"""Profile the non-stack parts of the train step: upsampler, first conv
(embedding gather), head+CE loss, encoder+VQ, weight-norm folding."""
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
from wavenet_autoencoders_tpu.train.step import init_state
from wavenet_autoencoders_tpu.ops import masked_cross_entropy, sequence_mask


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
    net = model.wavenet
    wp = state.params["wavenet"]

    B, T = cfg.batch_size, cfg.max_time_steps
    frames = T // cfg.get_hop_size()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 256, (B, T, 1)), jnp.int32)
    cfeat = jnp.asarray(rng.standard_normal((B, frames, cfg.dim_in)), jnp.float32)
    g = jnp.asarray(np.arange(B) % cfg.n_speakers, jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    # latent at encoder output rate
    dsr = 100 // cfg.frame_rate
    lat = jnp.asarray(rng.standard_normal((B, frames // dsr, cfg.cin_channels)), jnp.float32)

    bf = jnp.bfloat16

    # 1. upsampler
    def ups(p, lat):
        return net.upsample_conditioning(p, lat, dtype=bf).astype(jnp.float32).sum()
    dt = timeit(jax.jit(ups), wp, lat)
    print(f"upsampler fwd:        {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(jax.grad(ups)), wp, lat)
    print(f"upsampler f+b:        {dt*1e3:8.2f} ms")

    # 2. encoder+VQ
    def encvq(p, s, cfeat):
        enc = model.make_encoder()
        z = enc.apply(p["encoder"], cfeat, dtype=bf)
        q, vq_loss, perp, _i, _s = model._quantize(p, s, z, True)
        return q.astype(jnp.float32).sum() + vq_loss
    dt = timeit(jax.jit(encvq), state.params, state.model_state, cfeat)
    print(f"encoder+VQ fwd:       {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(jax.grad(encvq)), state.params, state.model_state, cfeat)
    print(f"encoder+VQ f+b:       {dt*1e3:8.2f} ms")

    # 3. first conv embedding gather
    from wavenet_autoencoders_tpu.ops.conv import conv1d_weight

    def first(p, x):
        w1 = conv1d_weight(p["first"], bf)[0]
        h = jnp.take(w1, x, axis=0) + p["first"]["b"]
        return h.astype(jnp.float32).sum()
    dt = timeit(jax.jit(first), wp, x)
    print(f"first-gather fwd:     {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(jax.grad(first)), wp, x)
    print(f"first-gather f+b:     {dt*1e3:8.2f} ms")

    # 3b. first conv as one-hot GEMM
    def first_oh(p, x):
        w1 = conv1d_weight(p["first"], bf)[0]
        oh = jax.nn.one_hot(x, 256, dtype=bf)
        h = oh @ w1 + p["first"]["b"]
        return h.astype(jnp.float32).sum()
    dt = timeit(jax.jit(first_oh), wp, x)
    print(f"first-onehot fwd:     {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(jax.grad(first_oh)), wp, x)
    print(f"first-onehot f+b:     {dt*1e3:8.2f} ms")

    # 4. head + CE loss from skips
    skips = jnp.asarray(rng.standard_normal((B, T, 256)) * 0.1, bf)
    from wavenet_autoencoders_tpu.ops.conv import conv1d_apply

    def head(p, skips):
        out = jax.nn.relu(skips)
        out = conv1d_apply(p["post1"], out, dtype=bf)
        out = jax.nn.relu(out)
        out = conv1d_apply(p["post2"], out, dtype=bf)
        mask = sequence_mask(lengths, T)
        return masked_cross_entropy(out[:, :-1], y[:, 1:], mask[:, 1:])
    dt = timeit(jax.jit(head), wp, skips)
    print(f"head+CE fwd:          {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(jax.grad(head, argnums=1)), wp, skips)
    print(f"head+CE f+b(x):       {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(jax.grad(head)), wp, skips)
    print(f"head+CE f+b(w):       {dt*1e3:8.2f} ms")

    # 5. weight-norm fold for all layers
    def fold(p):
        tot = jnp.float32(0.0)
        for lp in p["layers"]:
            for k in ("conv", "cproj", "gproj", "out", "skip"):
                if k in lp:
                    tot += conv1d_weight(lp[k], bf).astype(jnp.float32).sum()
        return tot
    dt = timeit(jax.jit(fold), wp)
    print(f"wn-fold all fwd:      {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(jax.grad(fold)), wp)
    print(f"wn-fold all f+b:      {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

def main2():
    # variant CE implementations, isolated
    import numpy as np
    B, T, Q = 40, 5119, 256
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, Q)), jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, Q, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.float32)

    def ce_gather(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.sum(mask)

    def ce_onehot(logits):
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        oh = jax.nn.one_hot(tgt, Q, dtype=logits.dtype)
        picked = jnp.sum(logits * oh, axis=-1).astype(jnp.float32)
        nll = lse - picked
        return jnp.sum(nll * mask) / jnp.sum(mask)

    for name, f in [("gather", ce_gather), ("onehot", ce_onehot)]:
        dt = timeit(jax.jit(f), logits)
        print(f"CE {name} fwd:   {dt*1e3:8.2f} ms")
        dt = timeit(jax.jit(jax.grad(f)), logits)
        print(f"CE {name} f+b:   {dt*1e3:8.2f} ms")

main2()
