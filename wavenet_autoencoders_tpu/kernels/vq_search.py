"""Fused VQ nearest-neighbour search kernel.

Accelerates ``models.bottlenecks._nearest_code``: for each latent vector,
argmin_k ||z - e_k||². The XLA path materializes the (N, K) distance matrix
in HBM; this kernel keeps the scores tile in VMEM, fusing the z@Eᵀ matmul
(MXU) with the norm terms and the argmin reduction, writing only the (N,)
indices and the (N, D) quantized rows.

Grid: 1-D over N tiles (codebook is small — K≤1024, D≤128 — and stays
resident in VMEM across the sequential TPU grid).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(z_ref, cb_ref, csq_ref, idx_ref, q_ref):
    z = z_ref[:]                        # (TN, D)
    cb = cb_ref[:]                      # (K, D)
    # scores: -2 z·e + ||e||²  (the ||z||² term is constant per row and
    # cannot change the argmin — dropped, same trick the MXU likes)
    scores = -2.0 * jnp.dot(z, cb.T, preferred_element_type=jnp.float32)
    scores = scores + csq_ref[:][None, :]
    idx = jnp.argmin(scores, axis=1).astype(jnp.int32)
    idx_ref[:] = idx[:, None]
    one_hot = jax.nn.one_hot(idx, cb.shape[0], dtype=jnp.float32)
    q_ref[:] = jnp.dot(one_hot, cb, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def vq_nearest_pallas(
    flat: jnp.ndarray, codebook: jnp.ndarray, tile: int = 512, interpret: bool = False
):
    """flat: (N, D) f32; codebook: (K, D) f32 ->
    (indices (N,) int32, quantized (N, D) f32)."""
    N, D = flat.shape
    K = codebook.shape[0]
    Np = pl.cdiv(N, tile) * tile
    if Np != N:
        flat = jnp.pad(flat, ((0, Np - N), (0, 0)))
    csq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)

    idx, q = pl.pallas_call(
        _kernel,
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            jax.ShapeDtypeStruct((Np, D), jnp.float32),
        ),
        interpret=interpret,
    )(flat.astype(jnp.float32), codebook.astype(jnp.float32), csq)
    return idx[:N, 0], q[:N]
