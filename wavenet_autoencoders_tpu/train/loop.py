"""The training loop.

Replaces ``train_loop`` / ``__main__`` of ``vqwae_train.py:801-875,
1066-1149``: alternating train/dev phases, periodic checkpointing, stop at
``max_train_steps``, KeyboardInterrupt checkpoints before exit, resolved
config frozen into the checkpoint dir. Device placement/sharding comes from
``parallel.mesh``; the step itself is the jitted function from
``train.step``.
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.data.dataset import WaveDataset, data_iterator
from wavenet_autoencoders_tpu.models.zoo import build_model
from wavenet_autoencoders_tpu.train.checkpoint import (
    AsyncCheckpointer,
    freeze_config,
    load_checkpoint,
    restore_parts,
    save_checkpoint,
)
from wavenet_autoencoders_tpu.train.metrics import MetricsWriter
from wavenet_autoencoders_tpu.train.step import (
    init_state,
    make_eval_step,
    make_train_step,
)


def train(
    cfg: Config,
    dump_root: str,
    checkpoint_dir: str,
    *,
    resume: str | None = None,
    restore_parts_from: str | None = None,
    reset_optimizer: bool = False,
    feat_type: str = "mfcc",
    max_steps: int | None = None,
    log_every: int = 50,
    dev_dump_root: str | None = None,
    mesh=None,
):
    """Run training; returns the final TrainState."""
    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    freeze_config(cfg, ckpt_dir)
    writer = MetricsWriter(ckpt_dir / "logs")

    model = build_model(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    state = init_state(cfg, model, key)

    if resume:
        state = load_checkpoint(state, resume, reset_optimizer=reset_optimizer)
        print(f"resumed from {resume} at step {int(state.step)}")
    elif restore_parts_from:
        state = state.__class__(
            params=restore_parts(state.params, restore_parts_from),
            opt_state=state.opt_state,
            ema_params=state.ema_params,
            model_state=state.model_state,
            step=state.step,
        )

    if mesh is None:
        from wavenet_autoencoders_tpu.parallel.mesh import make_mesh_for_batch

        mesh = make_mesh_for_batch(cfg, cfg.batch_size)
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    from wavenet_autoencoders_tpu.parallel.mesh import shard_batch, shard_state

    state = shard_state(state, mesh)

    step_fn = make_train_step(cfg, model)
    eval_fn = make_eval_step(cfg, model)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    train_ds = WaveDataset(dump_root, cfg, feat_type=feat_type)
    dev_ds = None
    if dev_dump_root is not None and Path(dev_dump_root, "train.txt").exists():
        dev_ds = WaveDataset(dev_dump_root, cfg, feat_type=feat_type)

    limit = max_steps if max_steps is not None else cfg.max_train_steps
    it = data_iterator(train_ds, cfg)
    t0, last_log_step = time.time(), int(state.step)
    samples_per_batch = None
    metrics = None
    profiling = False
    ckpt = AsyncCheckpointer()
    try:
        for batch in it:
            if int(state.step) >= limit:
                break
            # first-class profiling hook (SURVEY §5): trace steps 10..15
            if cfg.profile_dir and int(state.step) == 10 and not profiling:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            if profiling and int(state.step) >= 15:
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile trace written to {cfg.profile_dir}")
            batch = shard_batch(batch, mesh)
            samples_per_batch = batch["x"].shape[0] * batch["x"].shape[1]
            state, metrics = step_fn(state, batch, rng)
            step = int(state.step)

            if step % log_every == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                sps = samples_per_batch * (step - last_log_step) / max(dt, 1e-9)
                m["samples_per_sec"] = sps
                writer.scalars(step, "train_no_dev", m)
                print(
                    f"step {step} loss {m['loss']:.4f} aux {m['aux_loss']:.4f} "
                    f"perp {m['perplexity']:.1f} lr {m['lr']:.2e} {sps:,.0f} samp/s",
                    flush=True,
                )
                t0, last_log_step = time.time(), step

            if step > 0 and step % cfg.checkpoint_interval == 0:
                ckpt.save(state, ckpt_dir, save_optimizer_state=cfg.save_optimizer_state)
                if dev_ds is not None:
                    _run_dev(cfg, eval_fn, state, dev_ds, writer, step, rng)
                _try_save_states(cfg, model, state, step, batch, ckpt_dir)

            if step > 0 and step % cfg.train_eval_interval == 0:
                _try_eval_model(cfg, model, state, step, batch, ckpt_dir)
    except KeyboardInterrupt:
        print("interrupted — saving checkpoint before exit")
    if metrics is not None:
        writer.scalars(int(state.step), "train_no_dev", {k: float(v) for k, v in metrics.items()})
    ckpt.wait()
    save_checkpoint(state, ckpt_dir, save_optimizer_state=cfg.save_optimizer_state)
    writer.close()
    return state


def _try_save_states(cfg, model, state, step, batch, ckpt_dir):
    """Teacher-forced sample dump (vqwae_train.py:768-769) — best-effort."""
    try:
        import jax as _jax

        from wavenet_autoencoders_tpu.train.eval_hooks import save_states
        from wavenet_autoencoders_tpu.train.step import _prep_x

        params = state.ema_params if state.ema_params is not None else state.params
        y_hat, *_ = model.forward(
            params, state.model_state, _jax.random.PRNGKey(step),
            _prep_x(cfg, batch["x"]), batch.get("c"), batch.get("g"), train=False,
        )
        save_states(cfg, step, np.asarray(y_hat), batch, ckpt_dir)
    except Exception as e:  # qualitative eval must never kill training
        print(f"save_states skipped: {type(e).__name__}: {e}")


def _try_eval_model(cfg, model, state, step, batch, ckpt_dir):
    """Periodic full AR decode of a batch item (vqwae_train.py:772-774)."""
    try:
        from wavenet_autoencoders_tpu.train.eval_hooks import eval_model

        params = state.ema_params if state.ema_params is not None else state.params
        eval_dir = Path(ckpt_dir) / "intermediate" / "train_no_dev_eval"
        eval_model(cfg, model, params, state.model_state, step, batch, eval_dir)
    except Exception as e:
        print(f"eval_model skipped: {type(e).__name__}: {e}")


def _run_dev(cfg, eval_fn, state, dev_ds, writer, step, rng, max_batches: int = 10):
    it = data_iterator(dev_ds, cfg, batch_size=cfg.dev_batch_size, prefetch=0, epochs=1)
    acc, n = None, 0
    for i, batch in enumerate(it):
        if i >= max_batches:
            break
        m = eval_fn(state, batch, rng)
        m = {k: float(v) for k, v in m.items()}
        acc = m if acc is None else {k: acc[k] + m[k] for k in m}
        n += 1
    if n:
        writer.scalars(step, "dev", {k: v / n for k, v in acc.items()})
