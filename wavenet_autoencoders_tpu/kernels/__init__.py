"""Pallas TPU kernels for the hot paths (SURVEY.md §7 items 4 & 7).

Each kernel has an XLA fallback (the pure-JAX implementation it
accelerates) and interpret-mode tests; kernels are opt-in so correctness
never depends on them.
"""
from wavenet_autoencoders_tpu.kernels.vq_search import (  # noqa: F401
    vq_nearest_pallas,
)
