"""Multi-host initialization + per-host data sharding helpers.

The reference is strictly single-host (``vqwae_train.py:698-706``). Here,
multi-host runs initialize the JAX distributed runtime (DCN between hosts,
ICI within a slice); all shardings in ``parallel.mesh`` use global
semantics, so the train step is identical at any host count. Each host
feeds only its own shard of the global batch
(``host_local_batch_slice``).
"""
from __future__ import annotations

import os

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op when
    single-process."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=(
            process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
        ),
    )


def host_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's slice of the global batch — the input
    pipeline loads only these items."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch % n == 0, f"global batch {global_batch} % hosts {n} != 0"
    per = global_batch // n
    return i * per, per


def make_global_batch(local_arrays: dict, mesh) -> dict:
    """Assemble globally-sharded arrays from per-host local shards
    (jax.make_array_from_process_local_data), so the same pjit train step
    runs unchanged across hosts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in local_arrays.items():
        spec = P(*(["data"] + [None] * (np.ndim(v) - 1)))
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out


def replicate_to_mesh(tree, mesh):
    """Place a (host-identical) state pytree as globally-replicated arrays
    on a possibly multi-host mesh. Every process passes the same full
    values (deterministic init from the shared seed), so
    ``make_array_from_process_local_data`` with an empty PartitionSpec
    replicates without any cross-host transfer."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)


def is_main_process() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0
