"""Mask-weighted sequence losses (``vqwae_train.py:324-422``).

All losses take logits/params in channels-last (B, T, C) and integer or
scalar targets (B, T, 1), and return the mask-weighted mean — identical
reduction to the reference's ``(losses * mask).sum() / mask.sum()``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from wavenet_autoencoders_tpu.ops.mixture import (
    discretized_mix_logistic_loss,
    mix_gaussian_loss,
)


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) float 0/1 mask (``vqwae_train.py:324``)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def masked_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Softmax CE; logits (B, T, Q), integer targets (B, T) or (B, T, 1),
    mask (B, T) or (B, T, 1) (``vqwae_train.py:363-379``)."""
    if targets.ndim == 3:
        targets = targets[..., 0]
    if mask.ndim == 3:
        mask = mask[..., 0]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


def masked_mol_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    num_classes: int,
    log_scale_min: float,
) -> jnp.ndarray:
    """Masked discretized-MoL NLL (``vqwae_train.py:382-401``)."""
    if mask.ndim == 2:
        mask = mask[..., None]
    losses = discretized_mix_logistic_loss(
        y_hat, y, num_classes=num_classes, log_scale_min=log_scale_min, reduce=False
    )
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(losses * mask) / denom


def masked_mog_loss(
    y_hat: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray, log_scale_min: float
) -> jnp.ndarray:
    """Masked MoG NLL (``vqwae_train.py:404-422``)."""
    if mask.ndim == 2:
        mask = mask[..., None]
    losses = mix_gaussian_loss(y_hat, y, log_scale_min=log_scale_min, reduce=False)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(losses * mask) / denom
