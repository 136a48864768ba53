"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu.kernels.vq_search import vq_nearest_pallas
from wavenet_autoencoders_tpu.models.bottlenecks import _nearest_code


def test_vq_nearest_matches_xla():
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((300, 64)).astype(np.float32)
    cb = rng.standard_normal((256, 64)).astype(np.float32)
    idx_ref = np.asarray(_nearest_code(jnp.asarray(flat), jnp.asarray(cb)))
    idx_k, q_k = vq_nearest_pallas(jnp.asarray(flat), jnp.asarray(cb), tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_k), idx_ref)
    np.testing.assert_allclose(np.asarray(q_k), cb[idx_ref], atol=1e-6)


def test_vq_nearest_ragged_n():
    rng = np.random.default_rng(1)
    flat = rng.standard_normal((37, 8)).astype(np.float32)
    cb = rng.standard_normal((16, 8)).astype(np.float32)
    idx_k, q_k = vq_nearest_pallas(jnp.asarray(flat), jnp.asarray(cb), tile=32, interpret=True)
    idx_ref = np.asarray(_nearest_code(jnp.asarray(flat), jnp.asarray(cb)))
    np.testing.assert_array_equal(np.asarray(idx_k), idx_ref)
