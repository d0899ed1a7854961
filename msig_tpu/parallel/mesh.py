"""Device mesh + GSPMD data parallelism over ICI/DCN.

The reference is strictly single-device (/root/reference/main.py:30-35; no
torch.distributed anywhere). The TPU build scales with the idiomatic JAX
recipe instead of translating anything: a 1-D ``Mesh(('data',))`` over all
devices, batches sharded on the leading axis, parameters/optimizer state
replicated, and XLA emitting the gradient all-reduce over ICI on its own.
Multi-host (DCN) uses the exact same program after
``jax.distributed.initialize`` — GSPMD makes the mesh span hosts.

No tensor/pipeline/sequence parallelism is built: every network here is
well under ICI-worthwhile size (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    import numpy as np

    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (DATA_AXIS,))


def data_mesh_for_batch(batch_size: int) -> Optional[Mesh]:
    """Mesh over the most devices that evenly divide ``batch_size`` (None if 1)."""
    devs = jax.devices()
    k = len(devs)
    while k > 1 and batch_size % k != 0:
        k -= 1
    if 1 < k < len(devs):
        import logging

        logging.getLogger(__name__).warning(
            "batch_size=%d is not divisible by %d devices; using %d devices "
            "(the rest stay idle). Pick a batch size divisible by the device "
            "count to use the whole slice.",
            batch_size,
            len(devs),
            k,
        )
    return make_mesh(devs[:k]) if k > 1 else None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for image/label arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded along axis 0."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, optimizer state) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def jit_train_step(train_step, mesh: Optional[Mesh]):
    """Compile the fused step, data-parallel over ``mesh`` when given.

    State/VGG/scalars replicated, batch split on the data axis; gradient
    all-reduces are inserted by XLA (GSPMD). The state buffers are donated —
    the optimizer update happens in-place in HBM.
    """
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    # Single shardings act as pytree prefixes: `data` applies to every key
    # of the batch dict (including optional extras like 'target2').
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def initialize_multihost() -> None:
    """Multi-host DCN init: ``jax.distributed.initialize`` before any backend
    use. Must run first thing in the process; safe no-op on a single host
    without a coordinator configured."""
    import os

    try:
        jax.distributed.initialize()
    except Exception as e:  # single-host run / already initialized
        if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"
        ):
            raise
        import logging

        logging.getLogger(__name__).info(
            "jax.distributed not initialized (single-host run): %s", e
        )
