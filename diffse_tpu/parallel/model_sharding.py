"""Tensor (model)-parallel sharding over a 2-D ``(data, model)`` mesh.

The reference's only parallelism is data-parallel DDP (sgmse train.py:108).
This module is the beyond-reference TPU capability: conv/dense kernels are
sharded on their output-feature dimension across a ``model`` mesh axis while
batches shard across ``data`` — GSPMD then inserts the all-gather /
reduce-scatter collectives over ICI. The recipe follows the scaling-book
pattern: build a mesh, annotate leaf shardings, let XLA place collectives,
measure.

Production note: at the reference's 65M-parameter scale a single v5e chip
holds model + optimizer state comfortably, so pure DP stays the production
default (``parallel.mesh``); tensor parallelism is the scaling path for
wider variants (the nf/ch_mult config surface goes far beyond 65M) and for
meshes where per-chip HBM becomes the binding constraint.

Sharding rules (hints — GSPMD guarantees correctness regardless; the rules
only decide layout):

- 4-D ``kernel`` (H, W, in, out) -> ``P(None, None, None, 'model')``
- 2-D ``kernel`` (in, out)       -> ``P(None, 'model')``
- 1-D ``bias`` / ``scale``       -> ``P('model')``
- everything else (GroupNorm group counts, GFP ``W``, scalars, step) ->
  replicated ``P()``

A dimension is only sharded when divisible by the ``model`` axis size; the
EMA tree and Adam moments mirror the parameter tree, so one path-based rule
covers the whole TrainState.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(
    n_data: int,
    n_model: int,
    devices: Optional[Sequence] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """``(data, model)`` mesh over the first ``n_data * n_model`` devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for a {n_data}x{n_model} mesh, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, axis_names)


def _key_name(entry) -> str:
    # DictKey / GetAttrKey / SequenceKey all stringify usefully; DictKey and
    # GetAttrKey carry the actual name.
    for attr in ("key", "name"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def leaf_partition_spec(path, leaf, n_model: int, model_axis: str = "model") -> P:
    """Path/shape-based partition rule for one state leaf (see module doc)."""
    name = _key_name(path[-1]) if path else ""
    shape = tuple(getattr(leaf, "shape", ()))
    nd = len(shape)
    if name == "kernel" and nd == 4 and shape[-1] % n_model == 0:
        return P(None, None, None, model_axis)
    if name == "kernel" and nd == 2 and shape[-1] % n_model == 0:
        return P(None, model_axis)
    if name in ("bias", "scale") and nd == 1 and shape and shape[0] % n_model == 0:
        return P(model_axis)
    return P()


def tree_shardings(mesh: Mesh, tree: Any, model_axis: str = "model"):
    """NamedSharding pytree for any params-shaped tree (variables, TrainState,
    EMA, optimizer moments — the rule is path-based, so mirrored trees get
    mirrored layouts)."""
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape))[model_axis]

    def f(path, leaf):
        return NamedSharding(
            mesh, leaf_partition_spec(path, leaf, n_model, model_axis)
        )

    return jax.tree_util.tree_map_with_path(f, tree)


def shard_tree(mesh: Mesh, tree: Any, model_axis: str = "model"):
    """Place a host/device pytree according to :func:`tree_shardings`."""
    sh = tree_shardings(mesh, tree, model_axis)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)


# Aliases that read naturally at call sites.
shard_state = shard_tree
shard_variables = shard_tree
state_shardings = tree_shardings
variables_shardings = tree_shardings
