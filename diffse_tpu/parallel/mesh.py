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


def microbatch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 1 over the mesh — for gradient-accumulation super-batches
    whose axis 0 is the microbatch (scan) index and axis 1 the batch."""
    return NamedSharding(mesh, P(None, axis_name))


def stacked_batch_sharding(mesh: Mesh, lead_axes: int,
                           axis_name: str = "data") -> NamedSharding:
    """Shard axis ``lead_axes`` over the mesh — the general form of
    batch_sharding (lead_axes=0) / microbatch_sharding (lead_axes=1) for
    batches stacked with any number of leading scan axes (chained dispatch
    and/or gradient accumulation)."""
    return NamedSharding(mesh, P(*((None,) * lead_axes + (axis_name,))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data", spec=None):
    """Place a host batch (pytree of arrays) sharded on the batch axis
    (or with the explicit NamedSharding ``spec``, e.g. microbatch_sharding
    for gradient-accumulation super-batches)."""
    sh = spec if spec is not None else batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (jax.distributed). On a single host this is a
    no-op convenience; on a multi-host slice call before building the mesh —
    GSPMD then spans ICI/DCN transparently with the same program.

    Failure policy: only the *no-coordinator-configured* case degrades to a
    single-process run. If a coordinator was configured (explicit kwarg or
    env var) and initialization fails, the error is re-raised — a mistyped
    coordinator address must not silently turn a multi-host launch into a
    single-process one."""
    import logging
    import os

    log = logging.getLogger(__name__)
    # NOTE: must not touch jax.process_count()/jax.devices() here — querying
    # the backend initializes XLA, after which jax.distributed.initialize
    # always fails. is_initialized() checks the coordination client only.
    if jax.distributed.is_initialized():
        log.info("jax.distributed already initialized; continuing")
        return

    coordinator_configured = bool(kwargs.get("coordinator_address")) or any(
        os.environ.get(v)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    try:
        jax.distributed.initialize(**kwargs)
        log.info(
            "jax.distributed initialized: %d process(es), %d device(s)",
            jax.process_count(), len(jax.devices()),
        )
    except Exception as e:
        if "already initialized" in str(e).lower():
            log.info("jax.distributed already initialized; continuing")
            return
        if coordinator_configured:
            raise
        log.info(
            "no distributed coordinator configured; running single-process "
            "(initialize said: %s)", e,
        )
