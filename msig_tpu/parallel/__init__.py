"""Parallelism: device mesh, shardings, data-parallel step compilation."""

from msig_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    initialize_multihost,
    jit_train_step,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
