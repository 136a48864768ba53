"""Output distributions: discretized mixture of logistics + mixture of
Gaussians, losses and samplers.

Numerics mirror ``wavenet_vocoder/mixture.py`` exactly (clamps at
log_scale_min, 1e-12 CDF floor, the three-way edge-case select, uniform
noise in (1e-5, 1-1e-5)) so that checkpoints and samples are comparable.

Channels-last convention: parameter tensors are (B, T, C) with
C = 3*num_mixtures packed as [logit_probs | means | log_scales]
(the reference transposes its (B, C, T) input to this same layout at
``mixture.py:48``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    """Stable logsumexp over the last axis (``mixture.py:17-23``)."""
    m = jnp.max(x, axis=-1)
    m2 = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=-1))


def _log_softmax(x):
    return x - jax.scipy.special.logsumexp(x, axis=-1, keepdims=True)


def discretized_mix_logistic_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    num_classes: int = 256,
    log_scale_min: float = -7.0,
    reduce: bool = True,
) -> jnp.ndarray:
    """NLL of y in [-1, 1] under a discretized MoL (``mixture.py:26-106``).

    y_hat: (B, T, 3*M); y: (B, T, 1). Returns scalar sum if reduce else
    (B, T, 1).
    """
    assert y_hat.ndim == 3 and y_hat.shape[-1] % 3 == 0
    nr_mix = y_hat.shape[-1] // 3

    logit_probs = y_hat[:, :, :nr_mix]
    means = y_hat[:, :, nr_mix : 2 * nr_mix]
    log_scales = jnp.maximum(y_hat[:, :, 2 * nr_mix : 3 * nr_mix], log_scale_min)

    y = jnp.broadcast_to(y, means.shape)
    centered_y = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_y + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered_y - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)          # log sigmoid(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)           # log(1 - sigmoid(min_in))
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    # the reference's nested float-mask select (mixture.py:91-99)
    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0),
    )
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)

    log_probs = log_probs + _log_softmax(logit_probs)
    lse = log_sum_exp(log_probs)
    if reduce:
        return -jnp.sum(lse)
    return -lse[..., None]


def sample_from_discretized_mix_logistic(
    key,
    y: jnp.ndarray,
    log_scale_min: float = -7.0,
    clamp_log_scale: bool = False,
) -> jnp.ndarray:
    """Draw samples in [-1, 1]; y: (B, T, 3*M) -> (B, T)
    (``mixture.py:118-156``)."""
    assert y.shape[-1] % 3 == 0
    nr_mix = y.shape[-1] // 3
    logit_probs = y[:, :, :nr_mix]

    k1, k2 = jax.random.split(key)
    # Gumbel-max mixture pick with the reference's clipped uniforms
    temp = jax.random.uniform(k1, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5)
    temp = logit_probs - jnp.log(-jnp.log(temp))
    argmax = jnp.argmax(temp, axis=-1)

    one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)
    means = jnp.sum(y[:, :, nr_mix : 2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.sum(y[:, :, 2 * nr_mix : 3 * nr_mix] * one_hot, axis=-1)
    if clamp_log_scale:
        log_scales = jnp.maximum(log_scales, log_scale_min)
    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)


def mix_gaussian_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    log_scale_min: float = -7.0,
    reduce: bool = True,
) -> jnp.ndarray:
    """Continuous MoG NLL incl. the single-mixture C==2 special case
    (``mixture.py:161-218``). y_hat: (B, T, C); y: (B, T, 1)."""
    C = y_hat.shape[-1]
    if C == 2:
        nr_mix = 1
        logit_probs = None
        means = y_hat[:, :, 0:1]
        log_scales = jnp.maximum(y_hat[:, :, 1:2], log_scale_min)
    else:
        assert C % 3 == 0
        nr_mix = C // 3
        logit_probs = y_hat[:, :, :nr_mix]
        means = y_hat[:, :, nr_mix : 2 * nr_mix]
        log_scales = jnp.maximum(y_hat[:, :, 2 * nr_mix : 3 * nr_mix], log_scale_min)

    y = jnp.broadcast_to(y, means.shape)
    centered_y = y - means
    # Normal(0, exp(log_scales)).log_prob(centered_y)
    log_probs = (
        -0.5 * jnp.log(2.0 * jnp.pi)
        - log_scales
        - 0.5 * (centered_y * jnp.exp(-log_scales)) ** 2
    )
    if nr_mix > 1:
        log_probs = log_probs + _log_softmax(logit_probs)

    if reduce:
        if nr_mix == 1:
            return -jnp.sum(log_probs)
        return -jnp.sum(log_sum_exp(log_probs))
    if nr_mix == 1:
        return -log_probs
    return -log_sum_exp(log_probs)[..., None]


def sample_from_mix_gaussian(key, y: jnp.ndarray, log_scale_min: float = -7.0) -> jnp.ndarray:
    """Sample in [-1, 1]; y: (B, T, C) -> (B, T) (``mixture.py:221-270``)."""
    C = y.shape[-1]
    k1, k2 = jax.random.split(key)
    if C == 2:
        means, log_scales = y[:, :, 0], y[:, :, 1]
    else:
        nr_mix = C // 3
        logit_probs = y[:, :, :nr_mix]
        temp = jax.random.uniform(k1, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5)
        temp = logit_probs - jnp.log(-jnp.log(temp))
        argmax = jnp.argmax(temp, axis=-1)
        one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)
        means = jnp.sum(y[:, :, nr_mix : 2 * nr_mix] * one_hot, axis=-1)
        log_scales = jnp.sum(y[:, :, 2 * nr_mix : 3 * nr_mix] * one_hot, axis=-1)
    x = means + jnp.exp(log_scales) * jax.random.normal(k2, means.shape)
    return jnp.clip(x, -1.0, 1.0)
