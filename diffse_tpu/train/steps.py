"""Jitted train/eval step factories.

One XLA program per optimizer step: loss (incl. on-device STFT-domain bridge
math), backward pass, Adam update, and the EMA lerp — the functional twin of
Lightning's training_step + optimizer_step + ema.update
(sgmse/model.py:99-106, 397-400).

Data parallelism: the returned step functions are plain jitted functions; pass
``mesh`` to get in/out shardings that replicate the state and shard the batch
over the 'data' axis — XLA/GSPMD inserts the gradient all-reduce over ICI
(the functional twin of DDP's NCCL all-reduce, train.py:108).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, replicated_sharding
from .state import TrainState, ema_decay_schedule


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.999,
    mesh=None,
    donate: bool = True,
    preprocess: Optional[Callable] = None,
    state_sharding=None,
) -> Callable:
    """Build the jitted train step for a ScoreModel/SNRModel-like object
    exposing ``loss_fn(variables, batch, key, train=True) -> (loss, updates)``.

    ``preprocess`` (e.g. ``model.prepare_batch``) runs *inside* the jit so the
    raw-waveform -> spectrogram chain fuses into the same XLA program.
    """

    def step_fn(state: TrainState, batch, key: jax.Array):
        if preprocess is not None:
            batch = preprocess(batch)

        def loss_of_params(params):
            variables = {**state.variables, "params": params}
            loss, updates = model.loss_fn(variables, batch, key, train=True)
            return loss, updates

        (loss, mutable_updates), grads = jax.value_and_grad(loss_of_params, has_aux=True)(
            state.variables["params"]
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.variables["params"]
        )
        params = optax.apply_updates(state.variables["params"], updates)

        decay = ema_decay_schedule(ema_decay, state.step + 1)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * decay + (1.0 - decay) * p, state.ema_params, params
        )

        new_variables = {**state.variables, **mutable_updates, "params": params}
        new_state = state.replace(
            step=state.step + 1,
            variables=new_variables,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, {"train_loss": loss}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    # state_sharding (e.g. parallel.model_sharding.state_shardings for a 2-D
    # data x model mesh) overrides the replicated default: params/EMA/moments
    # live sharded on the 'model' axis and GSPMD places the collectives.
    ssh = rep if state_sharding is None else state_sharding
    return jax.jit(
        step_fn,
        in_shardings=(ssh, bsh, rep),
        out_shardings=(ssh, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh=None, preprocess: Optional[Callable] = None,
                   variables_sharding=None) -> Callable:
    """Validation loss step (no grads, EMA-agnostic: pass desired variables)."""

    def step_fn(variables, batch, key: jax.Array):
        if preprocess is not None:
            batch = preprocess(batch)
        loss, _ = model.loss_fn(variables, batch, key, train=False)
        return {"valid_loss": loss}

    if mesh is None:
        return jax.jit(step_fn)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    vsh = rep if variables_sharding is None else variables_sharding
    return jax.jit(step_fn, in_shardings=(vsh, bsh, rep), out_shardings=rep)


# The SNR estimator shares the generic step machinery.
make_snr_train_step = make_train_step
