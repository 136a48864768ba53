"""Disentanglement bottleneck family.

Re-creates, as pure functions over explicit (params, state) pytrees:

- plain VQ with the reference's *swapped-β* loss (β multiplies the codebook
  term — ``vector_quantization.py:41-43``; deliberately non-standard, kept
  for parity)
- sliced VQ (the paper's SVQ) with the standard loss form
  (``vector_quantization.py:114-118``), asymmetric K/K1 codebooks and
  generalized ``num_slices``
- EMA-codebook variants of both (``vector_quantization.py:132-306``):
  codebooks are non-gradient state updated with Laplace-smoothed EMA; under
  pjit the cluster statistics are global (XLA all-reduces the one-hot sums
  over the data axis automatically)
- Gumbel-softmax categorical bottleneck (CatWavAE, reconstructed from the
  ``CatWavAE(tau, k, hard, slices)`` signature at ``synthesis.py:78``)
- instance norm / AdaIN re-styling, Chorowski time-jitter, VQ-dropout
  (flags of the gitignored full VQVAE, ``synthesis.py:196-199``)

All operate channels-last: z is (B, T', D).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from wavenet_autoencoders_tpu.ops.conv import linear_init, linear_apply


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _nearest_code(flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour search via the ||z||² + ||e||² - 2 z·e expansion —
    one MXU matmul (reference uses torch.addmm the same way,
    ``vector_quantization.py:27-31``)."""
    dist = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        + jnp.sum(codebook**2, axis=1)[None, :]
        - 2.0 * jnp.dot(flat, codebook.T, preferred_element_type=jnp.float32)
    )
    return jnp.argmin(dist, axis=1)


def _perplexity(one_hot: jnp.ndarray) -> jnp.ndarray:
    avg = jnp.mean(one_hot, axis=0)
    return jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))


def _uniform_codebook(key, K, D):
    return jax.random.uniform(key, (K, D), jnp.float32, -1.0 / K, 1.0 / K)


# ---------------------------------------------------------------------------
# plain VQ (committed VectorQuantize, vector_quantization.py:10-49)
# ---------------------------------------------------------------------------


def vq_init(key, K: int, D: int) -> dict:
    return {"codebook": _uniform_codebook(key, K, D)}


def vq_apply(params: dict, z: jnp.ndarray, beta: float = 0.25):
    """Returns (quantized, vq_loss, perplexity, indices).

    Loss = β·mean((sg(q) - z)²) + mean((q - sg(z))²) — the reference's
    swapped form where β weights the *codebook-to-encoder* term.
    """
    B, T, D = z.shape
    flat = z.reshape(-1, D)
    codebook = params["codebook"]
    idx = _nearest_code(flat, codebook)
    q = jnp.take(codebook, idx, axis=0).reshape(B, T, D)

    codebook_term = jnp.mean((jax.lax.stop_gradient(q) - z) ** 2)
    commit_term = jnp.mean((q - jax.lax.stop_gradient(z)) ** 2)
    vq_loss = beta * codebook_term + commit_term

    q_st = z + jax.lax.stop_gradient(q - z)  # straight-through
    perp = _perplexity(jax.nn.one_hot(idx, codebook.shape[0]))
    return q_st, vq_loss, perp, idx.reshape(B, T)


# ---------------------------------------------------------------------------
# sliced VQ (SlicedVectorQuantize, vector_quantization.py:51-128)
# ---------------------------------------------------------------------------


def _slice_sizes(K: int, K1: int | None, num_slices: int) -> list[int]:
    """Codebook size per slice: slice 2 may use K1 (asymmetric SVQ, hparams
    ``use_K1``/``K1``); further slices reuse K."""
    sizes = [K] * num_slices
    if num_slices >= 2 and K1 is not None:
        sizes[1] = K1
    return sizes


def sliced_vq_init(key, K: int, D: int, num_slices: int = 2, K1: int | None = None) -> dict:
    assert D % num_slices == 0
    sub = D // num_slices
    sizes = _slice_sizes(K, K1, num_slices)
    keys = jax.random.split(key, num_slices)
    return {"codebooks": [_uniform_codebook(k, s, sub) for k, s in zip(keys, sizes)]}


def sliced_vq_apply(
    params: dict, z: jnp.ndarray, beta: float = 0.25, commit_scale: float = 1.0
):
    """Standard-form loss: mean((sg(q)-z)²) + β·mean((q-sg(z))²); perplexity
    is the SUM over slices (``vector_quantization.py:125-127``).

    ``commit_scale`` (default 1.0 = reference parity) scales the
    encoder-pull term mean((sg(q)-z)²) — the clustering force on the
    encoder output. The reference hardcodes it to 1; the round-5
    representation diagnosis (QUALITY.md §3.3) implicates it: the
    identical encoder trained without any VQ pull (IN-WAE) is
    phone-discriminative while every full-strength-commitment SVQ run is
    not, across frame rates, jitter settings and schedules."""
    B, T, D = z.shape
    books = params["codebooks"]
    n = len(books)
    sub = D // n
    flat = z.reshape(-1, D)
    qs, perp = [], 0.0
    idxs = []
    for i, cb in enumerate(books):
        part = flat[:, i * sub : (i + 1) * sub]
        idx = _nearest_code(part, cb)
        qs.append(jnp.take(cb, idx, axis=0))
        perp = perp + _perplexity(jax.nn.one_hot(idx, cb.shape[0]))
        idxs.append(idx.reshape(B, T))
    q = jnp.concatenate(qs, axis=1).reshape(B, T, D)

    codebook_term = jnp.mean((jax.lax.stop_gradient(q) - z) ** 2)
    commit_term = jnp.mean((q - jax.lax.stop_gradient(z)) ** 2)
    vq_loss = commit_scale * codebook_term + beta * commit_term

    q_st = z + jax.lax.stop_gradient(q - z)
    return q_st, vq_loss, perp, jnp.stack(idxs, axis=-1)


# ---------------------------------------------------------------------------
# EMA codebooks (vector_quantization.py:132-306)
# ---------------------------------------------------------------------------


def vq_ema_init(key, K: int, D: int, num_slices: int = 1, K1: int | None = None) -> dict:
    """EMA bottleneck state (no gradient params): per slice a codebook plus
    EMA cluster counts / weight sums."""
    if num_slices == 1:
        sizes, sub = [K], D
    else:
        assert D % num_slices == 0
        sizes, sub = _slice_sizes(K, K1, num_slices), D // num_slices
    keys = jax.random.split(key, len(sizes))
    return {
        "codebooks": [_uniform_codebook(k, s, sub) for k, s in zip(keys, sizes)],
        "cluster_size": [jnp.zeros((s,), jnp.float32) for s in sizes],
        "ema_w": [jnp.zeros((s, sub), jnp.float32) for s in sizes],
    }


def vq_ema_apply(
    state: dict,
    z: jnp.ndarray,
    beta: float = 0.25,
    decay: float = 0.99,
    train: bool = True,
):
    """Returns (quantized, vq_loss, perplexity, new_state).

    Loss is β·commit only (EMA codebooks get no gradient,
    ``vector_quantization.py:224,298``). Update rule with Laplace smoothing
    (ε=1e-5) mirrors ``vector_quantization.py:190-217``. Quantization uses
    the *updated* codebook within the same step, as the reference does.
    """
    B, T, D = z.shape
    books = state["codebooks"]
    n = len(books)
    sub = D // n
    flat = z.reshape(-1, D)

    new_books, new_cs, new_ew = [], [], []
    qs, perp = [], 0.0
    idxs = []
    for i, cb in enumerate(books):
        part = jax.lax.stop_gradient(flat[:, i * sub : (i + 1) * sub])
        K = cb.shape[0]
        idx = _nearest_code(part, cb)
        oh = jax.nn.one_hot(idx, K)
        if train:
            cs = state["cluster_size"][i] * decay + (1.0 - decay) * jnp.sum(oh, axis=0)
            ntot = jnp.sum(cs)
            cs = (cs + 1e-5) / (ntot + K * 1e-5) * ntot
            dw = jnp.dot(oh.T, part, preferred_element_type=jnp.float32)
            ew = state["ema_w"][i] * decay + (1.0 - decay) * dw
            cb_new = ew / cs[:, None]
        else:
            cs, ew, cb_new = state["cluster_size"][i], state["ema_w"][i], cb
        new_books.append(cb_new)
        new_cs.append(cs)
        new_ew.append(ew)
        qs.append(jnp.take(cb_new, idx, axis=0))
        perp = perp + _perplexity(oh)
        idxs.append(idx.reshape(B, T))

    q = jnp.concatenate(qs, axis=1).reshape(B, T, D)
    vq_loss = beta * jnp.mean((jax.lax.stop_gradient(q) - z) ** 2)
    q_st = z + jax.lax.stop_gradient(q - z)
    new_state = {"codebooks": new_books, "cluster_size": new_cs, "ema_w": new_ew}
    return q_st, vq_loss, perp, jnp.stack(idxs, axis=-1), new_state


# ---------------------------------------------------------------------------
# dead-code revival (anti-collapse; no reference counterpart — the
# reference's only lever is the Laplace smoothing inside the EMA update at
# vector_quantization.py:190-217, which rounds 1–3 showed is not enough to
# keep the codebook alive on a locally-predictive corpus)
# ---------------------------------------------------------------------------


def update_usage(usage: jnp.ndarray, counts: jnp.ndarray, decay: float) -> jnp.ndarray:
    """EMA of the per-code batch assignment fraction. ``counts`` is the mean
    one-hot over the batch's latent frames (sums to 1)."""
    return usage * decay + (1.0 - decay) * counts


def reseed_slice(
    rng,
    codebook: jnp.ndarray,
    usage: jnp.ndarray,
    z_slice: jnp.ndarray,
    thresh: float,
    active,
):
    """Revive dead codes: rows whose usage EMA fell below ``thresh/K`` (a
    fraction of the uniform share 1/K) are replaced by random encoder
    outputs from the current batch, and their usage is reset to uniform so
    a freshly revived code gets a grace window (~1/(1-decay) steps) before
    it can be declared dead again.

    Fully branchless (jnp.where masks) so it stays inside the jitted train
    step; ``active`` is a traced bool gating the whole operation (warm-up).

    Returns (new_codebook, new_usage, dead_mask).
    """
    K = codebook.shape[0]
    dead = (usage < thresh / K) & active
    cand_idx = jax.random.randint(rng, (K,), 0, z_slice.shape[0])
    cand = jnp.take(z_slice, cand_idx, axis=0).astype(codebook.dtype)
    new_cb = jnp.where(dead[:, None], cand, codebook)
    new_usage = jnp.where(dead, 1.0 / K, usage)
    return new_cb, new_usage, dead


# ---------------------------------------------------------------------------
# Gumbel-softmax categorical bottleneck (CatWavAE)
# ---------------------------------------------------------------------------


def gumbel_init(key, D: int, k: int, slices: int = 4) -> dict:
    """Per slice: linear logits head (sub_D -> k) + code table (k, sub_D).

    Reconstruction of the gitignored CatWavAE bottleneck from its ctor
    signature ``CatWavAE(..., tau, k, hard, slices)`` (``synthesis.py:78``).
    """
    assert D % slices == 0
    sub = D // slices
    keys = jax.random.split(key, 2 * slices)
    return {
        "heads": [linear_init(keys[2 * i], sub, k) for i in range(slices)],
        "codes": [
            0.01 * jax.random.normal(keys[2 * i + 1], (k, sub), jnp.float32)
            for i in range(slices)
        ],
    }


def gumbel_apply(
    params: dict,
    z: jnp.ndarray,
    rng,
    tau: float = 0.1,
    hard: bool = False,
    train: bool = True,
):
    """Gumbel-softmax select a code per slice; straight-through when hard.
    Returns (quantized, aux_loss=0, perplexity, indices)."""
    B, T, D = z.shape
    n = len(params["codes"])
    sub = D // n
    outs, perp, idxs = [], 0.0, []
    for i in range(n):
        part = z[:, :, i * sub : (i + 1) * sub]
        logits = linear_apply(params["heads"][i], part)  # (B, T, k)
        if train:
            rng, sk = jax.random.split(rng)
            gumbel = -jnp.log(-jnp.log(jax.random.uniform(sk, logits.shape, minval=1e-10, maxval=1.0)))
            w = jax.nn.softmax((logits + gumbel) / tau, axis=-1)
        else:
            w = jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1])
        if hard and train:
            h = jax.nn.one_hot(jnp.argmax(w, axis=-1), w.shape[-1])
            w = w + jax.lax.stop_gradient(h - w)
        outs.append(jnp.einsum("btk,kd->btd", w, params["codes"][i]))
        perp = perp + _perplexity(
            jax.nn.one_hot(jnp.argmax(w, axis=-1), w.shape[-1]).reshape(-1, w.shape[-1])
        )
        idxs.append(jnp.argmax(w, axis=-1))
    q = jnp.concatenate(outs, axis=-1)
    return q, jnp.float32(0.0), perp, jnp.stack(idxs, axis=-1)


# ---------------------------------------------------------------------------
# instance norm / AdaIN / time jitter / VQ dropout
# ---------------------------------------------------------------------------


def instance_norm(z: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-utterance, per-channel normalization over time (torch
    InstanceNorm1d, affine=False) — strips speaker statistics from the
    content code (IN-WAE, arXiv:2008.06892 §2)."""
    mean = jnp.mean(z, axis=1, keepdims=True)
    var = jnp.var(z, axis=1, keepdims=True)
    return (z - mean) / jnp.sqrt(var + eps)


def adain(content: jnp.ndarray, style: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Adaptive instance norm: re-style IN(content) with the target
    utterance's channel statistics (the ``tar_c`` voice-conversion path,
    ``synthesis.py:500-519``). content/style: (B, T, D)."""
    s_mean = jnp.mean(style, axis=1, keepdims=True)
    s_std = jnp.sqrt(jnp.var(style, axis=1, keepdims=True) + eps)
    return instance_norm(content, eps) * s_std + s_mean


def time_jitter(
    rng, z: jnp.ndarray, prob: float = 0.12, per_side: bool = True
) -> jnp.ndarray:
    """Chorowski time-jitter (hparam ``time_jitter`` of the gitignored
    VQVAE). Two readings, selected by ``per_side`` (the upstream model is
    unrecoverable, so the choice is configurable and documented):

    - per_side=True (this repo's historical default): each latent frame is
      replaced by its left/right neighbour with probability ``prob`` EACH
      (total replacement prob 2*prob);
    - per_side=False (Chorowski et al. 2019, §3.1): replaced with total
      probability ``prob``, direction uniform.
    """
    B, T, D = z.shape
    u = jax.random.uniform(rng, (B, T))
    p = prob if per_side else prob / 2.0
    shift = jnp.where(u < p, -1, jnp.where(u > 1.0 - p, 1, 0))
    idx = jnp.clip(jnp.arange(T)[None, :] + shift, 0, T - 1)
    return jnp.take_along_axis(z, idx[:, :, None], axis=1)


def vq_dropout(rng, z: jnp.ndarray, drop_dim: int) -> jnp.ndarray:
    """VQ-dropout (hparams ``vq_drop``/``drop_dim``): randomly zero a
    contiguous block of ``drop_dim`` latent channels per utterance,
    rescaling the rest to preserve expected norm."""
    B, T, D = z.shape
    if drop_dim <= 0:
        return z
    start = jax.random.randint(rng, (B, 1), 0, D - drop_dim + 1)
    ch = jnp.arange(D)[None, :]
    keep = ~((ch >= start) & (ch < start + drop_dim))
    scale = D / float(D - drop_dim)
    return z * keep[:, None, :] * scale
