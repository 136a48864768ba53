"""The training loop.

Replaces ``train_loop`` / ``__main__`` of ``vqwae_train.py:801-875,
1066-1149``: alternating train/dev phases with per-epoch averaged scalars,
periodic checkpointing, stop at ``max_train_steps``, KeyboardInterrupt
checkpoints before exit, resolved config frozen into the checkpoint dir.
Device placement/sharding comes from ``parallel.mesh``; the step itself is
the jitted function from ``train.step``.

Epoch structure mirrors the reference exactly (``vqwae_train.py:823-875``):
each epoch is one full pass over train_no_dev followed by one FULL pass
over dev, per-phase averaged loss/vq/perplexity emitted per epoch, and the
expensive AR decode on the dev phase runs once per
``test_eval_epoch_interval`` epochs (``vqwae_train.py:839-841``).

Multi-host (DCN): when ``jax.distributed`` is initialized with >1 process
(``parallel.distributed.initialize_distributed``, called by the CLI), every
process runs this same function; each host feeds its
``host_local_batch_slice`` of the global batch and the arrays are assembled
into globally-sharded jax.Arrays (``make_global_batch``) — the jitted step
is identical at any host count. Only process 0 writes checkpoints, metrics
and qualitative eval artifacts.
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
    make_sample_forward,
    make_train_step,
)


class CollapseAbort(SystemExit):
    """Raised (exit code 3) when the bottleneck-collapse monitor trips —
    a watchdog can distinguish this from a crash and stop relaunching."""

    def __init__(self, msg: str):
        super().__init__(3)
        self.msg = msg


def _host_int(x, tries: int = 4, wait: float = 5.0) -> int:
    """Device→host scalar read with retries. A transient backend error
    (e.g. a tunneled-TPU FAILED_PRECONDITION — the exact failure that
    killed the round-3 quality run at this call site) should surface as a
    diagnosed retry, not an instant crash."""
    for attempt in range(tries):
        try:
            return int(x)
        except Exception as e:  # jaxlib errors don't share a base class
            if attempt == tries - 1:
                raise
            print(
                f"device->host read failed ({type(e).__name__}: {e}); "
                f"retry {attempt + 1}/{tries - 1} in {wait:.0f}s",
                flush=True,
            )
            time.sleep(wait)


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
    from wavenet_autoencoders_tpu.parallel.distributed import (
        host_local_batch_slice,
        is_main_process,
        make_global_batch,
    )

    n_proc = jax.process_count()
    main = is_main_process()
    ckpt_dir = Path(checkpoint_dir)
    if main:
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        freeze_config(cfg, ckpt_dir)
    writer = MetricsWriter(ckpt_dir / "logs") if main else None

    model = build_model(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    state = init_state(cfg, model, key)

    if resume:
        state = load_checkpoint(state, resume, reset_optimizer=reset_optimizer)
        if main:
            print(f"resumed from {resume} at step {_host_int(state.step)}")
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
        if main:
            print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    from wavenet_autoencoders_tpu.parallel.mesh import shard_batch, shard_state

    if n_proc > 1:
        # DP across hosts: params/opt/EMA replicated globally (TP spans a
        # single host only, like the reference's single-host model); every
        # process holds the identical seeded init so replication is local.
        from wavenet_autoencoders_tpu.parallel.distributed import replicate_to_mesh

        state = replicate_to_mesh(state, mesh)

        def put_batch(b):
            return make_global_batch(b, mesh)

    else:
        state = shard_state(state, mesh)

        def put_batch(b):
            return shard_batch(b, mesh)

    step_fn = make_train_step(cfg, model)
    eval_fn = make_eval_step(cfg, model)
    fwd_fn = make_sample_forward(cfg, model)  # jitted once, reused each dump
    rng = jax.random.PRNGKey(cfg.seed + 1)

    train_ds = WaveDataset(dump_root, cfg, feat_type=feat_type)
    dev_ds = None
    if dev_dump_root is not None and Path(dev_dump_root, "train.txt").exists():
        dev_ds = WaveDataset(dev_dump_root, cfg, feat_type=feat_type)

    limit = max_steps if max_steps is not None else cfg.max_train_steps
    host_slice = host_local_batch_slice(cfg.batch_size) if n_proc > 1 else None
    # epoch structure (vqwae_train.py:823-875): the sampler drops the
    # ragged tail, so one epoch is len(ds) // batch_size steps
    steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
    # Single-host: device_put runs inside the prefetch thread so H2D
    # overlaps compute. Multi-host: make_global_batch stays on the main
    # thread (its per-process ordering must match across hosts).
    it = data_iterator(
        train_ds, cfg, host_slice=host_slice,
        transform=put_batch if n_proc == 1 else None,
    )
    # `step` is a HOST mirror of the device counter: reading
    # ``int(state.step)`` every iteration would force a device sync per
    # step (expensive through the tunneled-TPU transport) and serialize
    # the pipeline.
    step = _host_int(state.step)
    t0, last_log_step = time.time(), step
    samples_per_batch = None
    metrics = None
    profiling = False
    epoch_acc, epoch_n = None, 0
    perp_ema = None  # collapse monitor: host-side perplexity EMA
    ckpt = AsyncCheckpointer()
    # Graceful-stop contract: SIGTERM == "checkpoint and exit cleanly".
    # SIGINT alone is not enough — POSIX shells launch background children
    # with SIGINT *ignored*, so a watchdog-supervised trainer could never
    # be interrupt-saved (discovered the hard way in the round-4 quality
    # run). Registration is best-effort (main thread only).
    import signal as _signal

    _old_term = None

    def _on_sigterm(signum, frame):
        raise KeyboardInterrupt

    try:
        _old_term = _signal.signal(_signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass
    try:
        for batch in it:
            if step >= limit:
                break
            # first-class profiling hook (SURVEY §5): trace steps 10..15
            if cfg.profile_dir and step == 10 and not profiling:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            if profiling and step >= 15:
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile trace written to {cfg.profile_dir}")
            if n_proc > 1:
                batch = put_batch(batch)
            samples_per_batch = batch["x"].shape[0] * batch["x"].shape[1]
            state, metrics = step_fn(state, batch, rng)
            step += 1

            if step % log_every == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}  # the only sync
                dt = time.time() - t0
                sps = samples_per_batch * (step - last_log_step) / max(dt, 1e-9)
                m["samples_per_sec"] = sps
                if writer:
                    writer.scalars(step, "train_no_dev", m)
                if main:
                    reseed_s = (
                        f" reseed {m['reseeded']:.0f}" if m.get("reseeded") else ""
                    )
                    print(
                        f"step {step} loss {m['loss']:.4f} aux {m['aux_loss']:.4f} "
                        f"perp {m['perplexity']:.1f}{reseed_s} lr {m['lr']:.2e} "
                        f"{sps:,.0f} samp/s",
                        flush=True,
                    )
                t0, last_log_step = time.time(), step

                # collapse-abort monitor (anti-collapse lever #3): if the
                # perplexity EMA is still on the floor past the configured
                # step, save and abort with a distinct exit code instead of
                # burning the rest of the schedule on a dead bottleneck
                perp_ema = (
                    m["perplexity"] if perp_ema is None
                    else 0.9 * perp_ema + 0.1 * m["perplexity"]
                )
                if (
                    cfg.collapse_check_step > 0
                    and step >= cfg.collapse_check_step
                    and perp_ema < cfg.collapse_min_perplexity
                ):
                    msg = (
                        f"collapse_abort: perplexity EMA {perp_ema:.2f} < "
                        f"{cfg.collapse_min_perplexity} at step {step} — "
                        "bottleneck collapsed; aborting (exit 3)"
                    )
                    print(msg, flush=True)
                    if main:
                        ckpt.wait()
                        save_checkpoint(
                            state, ckpt_dir,
                            save_optimizer_state=cfg.save_optimizer_state,
                        )
                    if writer:
                        writer.close()
                    raise CollapseAbort(msg)

            # per-epoch running averages (vqwae_train.py:853-872) — summed
            # ON DEVICE (3 async scalar adds); float()ing here would block
            # the pipeline every step
            m_ep = {k: metrics[k] for k in ("loss", "aux_loss", "perplexity")}
            epoch_acc = (
                m_ep
                if epoch_acc is None
                else {k: epoch_acc[k] + m_ep[k] for k in m_ep}
            )
            epoch_n += 1

            if step > 0 and step % cfg.checkpoint_interval == 0:
                if main:
                    ckpt.save(state, ckpt_dir, save_optimizer_state=cfg.save_optimizer_state)
                    if n_proc == 1:
                        _try_save_states(cfg, fwd_fn, state, step, batch, ckpt_dir)
                    else:
                        # multi-host: run the dump on process 0 only, from
                        # its ADDRESSABLE shards (batch slice + local
                        # replica of the replicated params) — a local,
                        # non-collective forward, so no other process has
                        # to participate (vqwae_train.py:643-691 parity)
                        _try_save_states(
                            cfg, fwd_fn, _addressable_state(state), step,
                            _addressable_batch(batch), ckpt_dir,
                        )

            if step > 0 and step % cfg.train_eval_interval == 0 and main:
                if n_proc == 1:
                    _try_eval_model(cfg, model, state, step, batch, ckpt_dir)
                else:
                    _try_eval_model(
                        cfg, model, _addressable_state(state), step,
                        _addressable_batch(batch), ckpt_dir,
                    )

            if step % steps_per_epoch == 0:
                epoch = step // steps_per_epoch
                if writer and epoch_n:
                    avg_ep = {k: float(v) / epoch_n for k, v in epoch_acc.items()}
                    writer.scalars(epoch, "train_no_dev_epoch", avg_ep)
                    print(
                        f"Step {step} [train_no_dev] epoch {epoch} "
                        f"loss {avg_ep['loss']:.4f}",
                        flush=True,
                    )
                epoch_acc, epoch_n = None, 0
                if dev_ds is not None and epoch % max(1, cfg.dev_epoch_interval) == 0:
                    _run_dev(
                        cfg, eval_fn, state, dev_ds, writer, step, epoch, rng,
                        put_batch, n_proc,
                        do_ar_eval=(
                            main and epoch % cfg.test_eval_epoch_interval == 0
                        ),
                        model=model,
                        ckpt_dir=ckpt_dir,
                    )
                t0, last_log_step = time.time(), step  # exclude dev time
                if epoch >= cfg.nepochs:
                    # reference bounds training by epochs AND steps
                    # (vqwae_train.py:801: `for epoch in range(nepochs)`)
                    if main:
                        print(f"stopping: reached nepochs={cfg.nepochs}")
                    break
    except KeyboardInterrupt:
        print("interrupted — saving checkpoint before exit", flush=True)
    finally:
        if _old_term is not None:
            _signal.signal(_signal.SIGTERM, _old_term)
    if metrics is not None and writer:
        writer.scalars(_host_int(state.step), "train_no_dev", {k: float(v) for k, v in metrics.items()})
    ckpt.wait()
    if main:
        save_checkpoint(state, ckpt_dir, save_optimizer_state=cfg.save_optimizer_state)
    if writer:
        writer.close()
    return state


def _addressable_batch(batch):
    """This process's rows of a globally data-sharded batch, as host
    numpy — usable in a local (non-collective) jit on any host."""
    import numpy as _np

    def local(a):
        if not hasattr(a, "addressable_shards"):
            return _np.asarray(a)
        shards = sorted(
            a.addressable_shards, key=lambda s: (s.index[0].start or 0)
        )
        return _np.concatenate([_np.asarray(s.data) for s in shards], axis=0)

    return {k: local(v) for k, v in batch.items()}


def _addressable_state(state):
    """A process-local view of a (replicated) TrainState: each leaf becomes
    its first addressable single-device replica."""

    def local(x):
        if hasattr(x, "addressable_data"):
            return x.addressable_data(0)
        return x

    return jax.tree.map(local, state)


def _hook_params(cfg, state, step):
    """Params for qualitative decode hooks: the reference uses the EMA
    shadow there (vqwae_train.py:643-691), but a young shadow is mostly
    random init — use it only once it has warmed (step >= 5/(1-decay)),
    live params before that."""
    from wavenet_autoencoders_tpu.train.step import ema_warm_steps

    if state.ema_params is not None and step >= ema_warm_steps(cfg.ema_decay):
        return state.ema_params
    return state.params


def _try_save_states(cfg, fwd_fn, state, step, batch, ckpt_dir):
    """Teacher-forced sample dump (vqwae_train.py:768-769) — best-effort,
    through the cached jitted forward (no eager re-trace per call)."""
    try:
        from wavenet_autoencoders_tpu.train.eval_hooks import save_states
        from wavenet_autoencoders_tpu.train.step import _prep_x

        params = _hook_params(cfg, state, step)
        y_hat = fwd_fn(
            params, state.model_state, jax.random.PRNGKey(step),
            _prep_x(cfg, batch["x"]), batch.get("c"), batch.get("g"),
        )
        save_states(cfg, step, np.asarray(y_hat), batch, ckpt_dir)
    except Exception as e:  # qualitative eval must never kill training
        print(f"save_states skipped: {type(e).__name__}: {e}")


def _try_eval_model(cfg, model, state, step, batch, ckpt_dir, phase="train_no_dev"):
    """Periodic full AR decode of a batch item (vqwae_train.py:772-774)."""
    try:
        from wavenet_autoencoders_tpu.train.eval_hooks import eval_model

        params = _hook_params(cfg, state, step)
        eval_dir = Path(ckpt_dir) / "intermediate" / f"{phase}_eval"
        eval_model(cfg, model, params, state.model_state, step, batch, eval_dir)
    except Exception as e:
        print(f"eval_model skipped: {type(e).__name__}: {e}")


def _run_dev(
    cfg,
    eval_fn,
    state,
    dev_ds,
    writer,
    step,
    epoch,
    rng,
    put_batch,
    n_proc,
    do_ar_eval=False,
    model=None,
    ckpt_dir=None,
):
    """FULL dev pass (one epoch over the dev loader, vqwae_train.py:824-875):
    per-epoch averaged scalars; once per ``test_eval_epoch_interval`` epochs
    an AR decode of a dev utterance (the reference's ``test_evaluated``
    logic at :839-848)."""
    from wavenet_autoencoders_tpu.parallel.distributed import host_local_batch_slice

    bs = cfg.dev_batch_size
    host_slice = host_local_batch_slice(bs) if n_proc > 1 else None
    it = data_iterator(
        dev_ds, cfg, batch_size=bs, prefetch=0, epochs=1, host_slice=host_slice
    )
    acc, n = None, 0
    first_batch = None
    for batch in it:
        batch = put_batch(batch)
        if first_batch is None:
            first_batch = batch
        m = eval_fn(state, batch, rng)
        m = {k: float(v) for k, v in m.items()}
        acc = m if acc is None else {k: acc[k] + m[k] for k in m}
        n += 1
    if n and writer:
        avg = {k: v / n for k, v in acc.items()}
        writer.scalars(step, "dev", avg)
        writer.scalars(epoch, "dev_epoch", avg)
        print(
            f"Step {step} [dev] epoch {epoch} loss {avg['loss']:.4f} "
            f"aux {avg['aux_loss']:.4f} perp {avg['perplexity']:.1f}",
            flush=True,
        )
    if do_ar_eval and first_batch is not None and model is not None:
        if n_proc > 1:  # process-0 local view (see _addressable_batch)
            state = _addressable_state(state)
            first_batch = _addressable_batch(first_batch)
        _try_eval_model(cfg, model, state, step, first_batch, ckpt_dir, phase="dev")
