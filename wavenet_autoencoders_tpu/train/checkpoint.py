"""Checkpointing: atomic npz pytree snapshots + config freeze.

Replaces torch-pickle checkpoints (``vqwae_train.py:878-910,950-999``) with
a self-describing format: every leaf saved under its tree path in one .npz.
Keeps the reference's operational contract:

- rolling ``checkpoint_latest`` copy
- parallel ``*_ema`` checkpoint holding the parameter-EMA shadow
- exact resume of {params, optimizer, EMA, quantizer state, step}
- ``restore_parts``: name-intersection partial load tolerant of shape
  mismatch
- resolved config frozen to ``<dir>/config.json`` at train start
  (``vqwae_train.py:1100-1102``)

Writes are atomic (tmp + rename) so preemption mid-write never corrupts the
latest checkpoint.
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_pytree(tree, path: str | Path) -> None:
    path = Path(path)
    flat = _flatten(tree)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    os.close(fd)
    try:
        np.savez(tmp, **flat)
        # np.savez appends .npz to a name without it
        tmp_npz = tmp if tmp.endswith(".npz") else tmp + ".npz"
        os.replace(tmp_npz, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_into_pytree(template, path: str | Path):
    """Load leaves by tree path into the structure of ``template``."""
    z = np.load(Path(path))
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path_k, leaf in leaves_p:
        key = "/".join(_path_str(p) for p in path_k)
        if key not in z:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = z[key]
        out.append(arr.astype(leaf.dtype) if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, out)


def restore_parts(template, path: str | Path, log=print):
    """Partial, shape-tolerant restore (``vqwae_train.py:980-999``): leaves
    present in the checkpoint with matching shape are loaded; everything
    else keeps the template value."""
    z = np.load(Path(path))
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(template)
    out, skipped = [], []
    for path_k, leaf in leaves_p:
        key = "/".join(_path_str(p) for p in path_k)
        if key in z and z[key].shape == tuple(np.shape(leaf)):
            out.append(z[key].astype(leaf.dtype) if hasattr(leaf, "dtype") else z[key])
        else:
            out.append(leaf)
            skipped.append(key)
    if skipped:
        log(f"restore_parts: kept {len(skipped)} template leaves (missing/shape-mismatch): "
            + ", ".join(skipped[:8]) + ("..." if len(skipped) > 8 else ""))
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# TrainState-level API
# ---------------------------------------------------------------------------


def save_checkpoint(state, checkpoint_dir: str | Path, step: int | None = None, save_optimizer_state: bool = True):
    """Write checkpoint_step{N}.npz (+ _ema) and refresh the rolling
    checkpoint_latest copies."""
    from wavenet_autoencoders_tpu.train.step import TrainState

    d = Path(checkpoint_dir)
    d.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else int(step)

    payload = {
        "params": state.params,
        "model_state": state.model_state,
        "step": np.int64(step),
    }
    if save_optimizer_state:
        payload["opt_state"] = state.opt_state
    main = d / f"checkpoint_step{step:09d}.npz"
    save_pytree(payload, main)
    shutil.copyfile(main, d / "checkpoint_latest.npz")

    if state.ema_params is not None:
        # parallel EMA checkpoint: params replaced by the shadow
        # (vqwae_train.py:896-910)
        ema_payload = dict(payload)
        ema_payload["params"] = state.ema_params
        ema_main = d / f"checkpoint_step{step:09d}_ema.npz"
        save_pytree(ema_payload, ema_main)
        shutil.copyfile(ema_main, d / "checkpoint_latest_ema.npz")
    return main


class AsyncCheckpointer:
    """Preemption-safe asynchronous checkpointing (SURVEY §5 gap): device
    state is snapshot to host synchronously (cheap), the npz write + latest
    rotation runs on a background thread so the train loop never blocks on
    disk. ``wait()`` before exit."""

    def __init__(self):
        import threading

        self._thread: "threading.Thread | None" = None

    def save(self, state, checkpoint_dir, step=None, save_optimizer_state=True):
        import threading

        import jax

        self.wait()
        host_state = jax.tree.map(lambda x: np.asarray(x), state)
        self._thread = threading.Thread(
            target=save_checkpoint,
            args=(host_state, checkpoint_dir, step, save_optimizer_state),
            daemon=True,
        )
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def load_checkpoint(state, path: str | Path, reset_optimizer: bool = False):
    """Exact resume (``vqwae_train.py:959-976``). Returns a new TrainState
    with restored params/model_state/step (+ optimizer unless reset)."""
    from wavenet_autoencoders_tpu.train.step import TrainState

    z = np.load(Path(path))
    params = _load_prefixed(state.params, z, "params")
    model_state = _load_prefixed(state.model_state, z, "model_state")
    step = np.int32(z["step"]) if "step" in z else state.step
    opt_state = state.opt_state
    if not reset_optimizer and any(k.startswith("opt_state/") for k in z.files):
        opt_state = _load_prefixed(state.opt_state, z, "opt_state")
    ema = state.ema_params
    if ema is not None:
        # the main checkpoint holds raw params; the EMA shadow restarts from
        # them (exact parity requires loading the _ema sibling explicitly)
        ema_path = str(path).replace(".npz", "_ema.npz")
        if Path(ema_path).exists():
            ze = np.load(ema_path)
            ema = _load_prefixed(state.ema_params, ze, "params")
        else:
            ema = jax.tree.map(np.copy, params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        ema_params=ema,
        model_state=model_state,
        step=jax.numpy.asarray(step, jax.numpy.int32),
    )


def _load_prefixed(template, z, prefix):
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path_k, leaf in leaves_p:
        key = prefix + "/" + "/".join(_path_str(p) for p in path_k)
        if key in z:
            out.append(z[key].astype(leaf.dtype) if hasattr(leaf, "dtype") else z[key])
        else:
            raise KeyError(f"checkpoint missing {key}")
    return jax.tree_util.tree_unflatten(treedef, out)


def freeze_config(cfg, checkpoint_dir: str | Path):
    d = Path(checkpoint_dir)
    d.mkdir(parents=True, exist_ok=True)
    cfg.save(d / "config.json")
