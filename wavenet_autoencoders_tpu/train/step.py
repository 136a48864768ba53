"""The jitted train/eval step.

One ``jax.jit``-compiled function does everything the reference's
``__train_step`` (``vqwae_train.py:709-798``) spreads over host code:
LR-schedule lookup, forward, masked one-step-ahead loss (+VQ aux), backward,
global-norm clipping, Adam update, parameter-EMA and VQ-codebook-EMA updates
— all on device. Under a sharded batch (data axis of the mesh) XLA inserts
the gradient all-reduce over ICI automatically; the VQ-EMA cluster
statistics are global reductions for the same reason (SURVEY.md §2.6).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.ops import (
    masked_cross_entropy,
    masked_mog_loss,
    masked_mol_loss,
    sequence_mask,
)
from wavenet_autoencoders_tpu.train.schedule import get_schedule


@dataclass
class TrainState:
    """Replicated training state pytree (registered below)."""

    params: Any
    opt_state: Any
    ema_params: Any        # parameter EMA shadow (vqwae_train.py:339-360)
    model_state: Any       # non-gradient state (VQ-EMA codebooks)
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.ema_params, self.model_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_optimizer(cfg: Config):
    """Adam per ``optimizer_params`` (vqwae_train.py:1119-1120); LR is
    injected per-step (optax.inject_hyperparams) to honor the reference's
    mutate-lr-in-place scheduling."""
    op = cfg.optimizer_params
    assert cfg.optimizer.lower() in ("adam", "adamw"), cfg.optimizer
    wd = float(op.get("weight_decay", 0.0))

    def make(lr):
        if wd > 0.0:
            return optax.adamw(lr, eps=float(op.get("eps", 1e-8)), weight_decay=wd)
        return optax.adam(lr, eps=float(op.get("eps", 1e-8)))

    return optax.inject_hyperparams(make)(lr=float(op["lr"]))


def init_state(cfg: Config, model, key) -> TrainState:
    params, model_state = model.init(key)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if cfg.exponential_moving_average else None
    return TrainState(
        params=params,
        opt_state=opt_state,
        ema_params=ema,
        model_state=model_state,
        step=jnp.zeros((), jnp.int32),
    )


def _recon_loss(cfg: Config, y_hat, y, mask):
    """One-step-ahead objective (vqwae_train.py:744-766): predict y[t+1]
    from y_hat[t], masked by (shifted) lengths."""
    y_hat_s = y_hat[:, :-1]
    y_s = y[:, 1:]
    mask_s = mask[:, 1:]
    if cfg.is_mulaw_quantize:
        return masked_cross_entropy(y_hat_s, y_s, mask_s)
    if cfg.output_distribution == "Logistic":
        return masked_mol_loss(y_hat_s, y_s, mask_s, cfg.quantize_channels, cfg.log_scale_min)
    if cfg.output_distribution == "Normal":
        return masked_mog_loss(y_hat_s, y_s, mask_s, cfg.log_scale_min)
    raise ValueError(cfg.output_distribution)


def _is_feature_ae(model) -> bool:
    from wavenet_autoencoders_tpu.models.mfcc_ae import MfccAE

    return isinstance(model, MfccAE)


def _prep_x(cfg: Config, x):
    """Host batches carry compact waveforms (int codes (B,T) for
    mulaw-quantize, float (B,T) scalars otherwise). Integer codes pass
    through — the WaveNet first conv gathers embedding rows directly
    instead of materializing a (B, T, 256) one-hot."""
    if x.ndim == 3:
        return x
    if cfg.is_mulaw_quantize:
        return x.astype(jnp.int32)
    return x[..., None].astype(jnp.float32)


def make_train_step(cfg: Config, model, tx=None, donate: bool = True):
    """Build the jitted train step:

        state, metrics = step_fn(state, batch, rng)

    batch: dict(x=(B,T,Cin) float, y=(B,T,1) int/float targets,
    c=(B,T',cin) or None, g=(B,) int or None, lengths=(B,) int).
    """
    tx = tx if tx is not None else make_optimizer(cfg)
    schedule = get_schedule(
        cfg.lr_schedule, float(cfg.optimizer_params["lr"]), cfg.lr_schedule_kwargs
    )
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    ema_decay = cfg.ema_decay

    feature_space = _is_feature_ae(model)
    reseed = bool(getattr(model, "reseed", False))
    warmup = int(cfg.vq_warmup_steps or 0)
    jitter_start = int(cfg.time_jitter_start or 0) if getattr(
        model, "use_time_jitter", False
    ) else 0

    def loss_fn(params, model_state, rng, batch, ramp, jgate):
        x = _prep_x(cfg, batch["x"])
        extra = {"jitter_scale": jgate} if jitter_start > 0 else {}
        y_hat, aux, perp, new_model_state = model.forward(
            params,
            model_state,
            rng,
            x,
            batch.get("c"),
            batch.get("g"),
            train=True,
            dtype=dtype,
            **extra,
        )
        if feature_space:
            # MFCC-only AEs reconstruct the features themselves (MSE)
            recon = jnp.mean((y_hat.astype(jnp.float32) - batch["c"]) ** 2)
        else:
            mask = sequence_mask(batch["lengths"], x.shape[1])[..., None]
            recon = _recon_loss(cfg, y_hat.astype(jnp.float32), batch["y"], mask)
        # commitment warm-up: ramp the VQ aux loss in so the encoder may
        # move freely to an informative configuration before the codebook
        # constraint bites (anti-collapse; aux is reported unscaled)
        loss = recon + ramp * aux
        return loss, (recon, aux, perp, new_model_state)

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if warmup > 0:
            ramp = jnp.clip(state.step.astype(jnp.float32) / warmup, 0.0, 1.0)
        else:
            ramp = jnp.float32(1.0)
        jgate = (
            (state.step >= jitter_start).astype(jnp.float32)
            if jitter_start > 0
            else jnp.float32(1.0)
        )
        (loss, (recon, aux, perp, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.model_state, rng, batch, ramp, jgate)

        gnorm = optax.global_norm(grads)
        if cfg.clip_thresh and cfg.clip_thresh > 0:
            scale = jnp.minimum(1.0, cfg.clip_thresh / jnp.maximum(gnorm, 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        lr = schedule(state.step)
        opt_state = state.opt_state
        opt_state.hyperparams["lr"] = lr
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if reseed:
            # dead-code revival AFTER the optimizer touched the codebook:
            # forward stashed this batch's encoder outputs + assignment
            # counts under "_vq_diag"; popping it keeps the returned state
            # structure identical to the input's (jit donation contract)
            diag = new_model_state.pop("_vq_diag")
            new_params, new_model_state, n_reseeded = model.revive(
                new_params, new_model_state, diag,
                jax.random.fold_in(rng, 0x5EED), state.step,
            )
        else:
            n_reseeded = jnp.float32(0.0)

        if state.ema_params is not None:
            # shadow -= (1 - decay) * (shadow - param)  (vqwae_train.py:347-350)
            new_ema = jax.tree.map(
                lambda s, p: s - (1.0 - ema_decay) * (s - p),
                state.ema_params,
                new_params,
            )
        else:
            new_ema = None

        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            model_state=new_model_state,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "recon_loss": recon,
            "aux_loss": aux,
            "perplexity": perp,
            "grad_norm": gnorm,
            "lr": lr,
            "reseeded": n_reseeded,
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_sample_forward(cfg: Config, model):
    """A cached jitted teacher-forced forward returning y_hat only, for the
    periodic ``save_states`` sample dump (vqwae_train.py:643-691) — avoids
    the eager full-shape re-trace per checkpoint the r1 loop paid."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def fwd(params, model_state, rng, x, c, g):
        y_hat, *_ = model.forward(
            params, model_state, rng, x, c, g, train=False, dtype=dtype
        )
        return y_hat

    return jax.jit(fwd)


def ema_warm_steps(ema_decay: float) -> int:
    """Steps before the EMA shadow is a faithful parameter average.

    ``shadow -= (1-decay)*(shadow-param)`` leaves ``decay**step`` of the
    random init in the shadow; ~5 time constants (decay^step < 1%%) is the
    conventional warm point. Evaluating the 0.9999 shadow at a 14k-step
    schedule (25%% init blend) produced uniform-looking dev CE for two
    rounds — the round-4 verdict's headline bug."""
    if ema_decay >= 1.0:
        return 1 << 30
    import math

    return int(math.ceil(5.0 / (1.0 - ema_decay)))


def make_eval_step(cfg: Config, model):
    """Forward-only metrics on the dev split (phase 'dev' of
    vqwae_train.py:824-859).

    Primary metrics come from the LIVE params — the reference computes dev
    loss on the live model (``vqwae_train.py:849-852``); EMA there feeds
    only the decode hook and the ``_ema`` checkpoint. The EMA shadow's
    recon loss is reported as a separate ``recon_loss_ema`` scalar so the
    shadow's convergence is observable without contaminating the headline
    dev loss (it is ~``decay**step`` random init early in training)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def eval_fn(state: TrainState, batch, rng):
        x = _prep_x(cfg, batch["x"])
        y_hat, aux, perp, _ = model.forward(
            state.params,
            state.model_state,
            rng,
            x,
            batch.get("c"),
            batch.get("g"),
            train=False,
            dtype=dtype,
        )
        mask = sequence_mask(batch["lengths"], x.shape[1])[..., None]
        recon = _recon_loss(cfg, y_hat.astype(jnp.float32), batch["y"], mask)
        out = {"loss": recon + aux, "recon_loss": recon, "aux_loss": aux, "perplexity": perp}
        if state.ema_params is not None:
            y_hat_e, aux_e, _, _ = model.forward(
                state.ema_params,
                state.model_state,
                rng,
                x,
                batch.get("c"),
                batch.get("g"),
                train=False,
                dtype=dtype,
            )
            out["recon_loss_ema"] = _recon_loss(
                cfg, y_hat_e.astype(jnp.float32), batch["y"], mask
            )
        return out

    return jax.jit(eval_fn)
