"""Pallas TPU kernels for the hot paths (SURVEY.md §7 items 4 & 7).

Each kernel has an XLA fallback (the pure-JAX implementation it
accelerates) and interpret-mode tests; kernels are opt-in so correctness
never depends on them.

A fused VQ nearest-neighbour kernel was prototyped and measured on-chip
at (N, K, D) = (320..40960, 256, 64): no win over the XLA addmm
expansion (1.11x at best, <1x at scale — the op is dispatch-bound at
these sizes), so it was removed rather than shipped as shelf-ware;
``models.bottlenecks._nearest_code`` is the supported path.
"""
