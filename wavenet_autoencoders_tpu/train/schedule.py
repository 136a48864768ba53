"""Learning-rate schedules (parity with reference ``lrschedule.py``),
as pure jnp functions of the step counter so they trace into the jitted
train step. Selected by name via ``get_schedule`` — the reference's
``getattr(lrschedule, hparams.lr_schedule)`` dispatch
(``vqwae_train.py:730-733``)."""
from __future__ import annotations

import jax.numpy as jnp


def noam_learning_rate_decay(init_lr, global_step, warmup_steps=4000):
    """lrschedule.py:5-11."""
    warmup_steps = float(warmup_steps)
    step = jnp.asarray(global_step, jnp.float32) + 1.0
    return init_lr * warmup_steps**0.5 * jnp.minimum(
        step * warmup_steps**-1.5, step**-0.5
    )


def step_learning_rate_decay(init_lr, global_step, anneal_rate=0.98, anneal_interval=100000):
    """lrschedule.py:14-17."""
    return init_lr * anneal_rate ** (jnp.asarray(global_step) // anneal_interval)


def cyclic_cosine_annealing(init_lr, global_step, T, M):
    """lrschedule.py:20-35."""
    TdivM = T // M
    return (
        init_lr
        / 2.0
        * (jnp.cos(jnp.pi * ((jnp.asarray(global_step) - 1) % TdivM) / TdivM) + 1.0)
    )


_SCHEDULES = {
    "noam_learning_rate_decay": noam_learning_rate_decay,
    "step_learning_rate_decay": step_learning_rate_decay,
    "cyclic_cosine_annealing": cyclic_cosine_annealing,
}


def get_schedule(name: str | None, init_lr: float, kwargs: dict):
    """Returns step -> lr."""
    if name is None or name == "none":
        return lambda step: jnp.float32(init_lr)
    fn = _SCHEDULES[name]
    return lambda step: fn(init_lr, step, **kwargs)
