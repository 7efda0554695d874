"""Device mesh + sharding helpers: the framework's parallelism layer.

The reference's only parallelism is data-parallel DDP over NCCL
(sgmse train.py:108: ``DDPPlugin(find_unused_parameters=False)``). The
TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over the 'data' axis:

  - batches carry ``NamedSharding(mesh, P('data', ...))``,
  - parameters/optimizer state are replicated (``P()``),
  - the gradient mean emerges as an XLA all-reduce over ICI when the jitted
    train step computes a batch-mean loss — GSPMD inserts the collective, and
    on multi-host slices it automatically rides ICI intra-slice / DCN
    inter-slice.

Multi-host entry is ``initialize_distributed()`` (jax.distributed), after
which the exact same jitted program runs unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch (pytree of arrays) sharded on the batch axis."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (jax.distributed). On a single host this is a
    no-op convenience; on a multi-host slice call before building the mesh —
    GSPMD then spans ICI/DCN transparently with the same program."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Single-process (no coordinator configured): run locally.
        pass
