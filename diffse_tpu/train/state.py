"""Functional training state: params + EMA + optimizer state.

TPU-native equivalent of the reference's Lightning/torch-ema machinery
(sgmse/model.py:87-134): the EMA tree lives alongside the parameters inside
one pytree; the eval-time "swap EMA weights in" (model.py:120-134) becomes a
pure function selecting which tree feeds inference; the EMA update runs inside
the jitted train step (model.py:103-106 runs it after each optimizer step).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    variables: Any  # {'params': ..., ['batch_stats': ...]}
    ema_params: Any  # EMA of variables['params']
    opt_state: Any


def ema_decay_schedule(decay: float, num_updates: jnp.ndarray) -> jnp.ndarray:
    """torch_ema's use_num_updates warm-up:
    decay_t = min(decay, (1 + n) / (10 + n))."""
    n = num_updates.astype(jnp.float32)
    return jnp.minimum(decay, (1.0 + n) / (10.0 + n))


def create_train_state(variables: Any, optimizer: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        variables=variables,
        # materialize a distinct copy: the EMA must not alias the parameter
        # buffers (buffer donation in the jitted train step requires each
        # donated argument leaf to be a distinct buffer)
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )


def eval_variables(state: TrainState, no_ema: bool = False) -> Any:
    """Variables for evaluation: EMA weights by default (the functional twin
    of ema.store/copy_to on .eval(), model.py:120-134)."""
    if no_ema:
        return state.variables
    return {**state.variables, "params": state.ema_params}
