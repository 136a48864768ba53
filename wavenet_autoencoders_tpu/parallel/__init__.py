from wavenet_autoencoders_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_state,
    param_sharding_tree,
)
