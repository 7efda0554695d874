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

from ..parallel.mesh import (
    batch_sharding,
    replicated_sharding,
    stacked_batch_sharding,
)
from .state import TrainState, ema_decay_schedule


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.999,
    mesh=None,
    donate: bool = True,
    preprocess: Optional[Callable] = None,
    state_sharding=None,
    accum_steps: int = 1,
    chain_steps: int = 1,
) -> Callable:
    """Build the jitted train step for a ScoreModel/SNRModel-like object
    exposing ``loss_fn(variables, batch, key, train=True) -> (loss, updates)``.

    ``preprocess`` (e.g. ``model.prepare_batch``) runs *inside* the jit so the
    raw-waveform -> spectrogram chain fuses into the same XLA program.

    ``accum_steps`` > 1 enables gradient accumulation (beyond the reference,
    which only scales batch via DDP): the step then expects batch leaves with
    a leading microbatch axis ``(accum_steps, b, ...)`` and runs one
    ``lax.scan`` over the microbatches — forward+backward per microbatch,
    grads averaged, ONE optimizer/EMA update. Peak activation memory is that
    of a single microbatch, so effective batch ``accum_steps * b`` trains in
    the HBM footprint of ``b`` (composes with ``--remat``). The per-microbatch
    noise keys are ``jax.random.split(key, accum_steps)``.

    ``chain_steps`` > 1 fuses that many FULL optimizer updates (forward +
    backward + Adam + EMA each) into ONE dispatched XLA program via a
    ``lax.scan`` carrying the TrainState. The step then expects batch leaves
    with an extra outermost axis ``(chain_steps, ...)`` stacked over
    consecutive loader batches. This is a dispatch-amortization lever with
    no training-semantics change (chained == sequential steps to float
    tolerance, tests/test_train.py): on a high-latency host<->device link
    (the axon bridge: ~60-80 ms/step of upload+dispatch overhead vs ~18 ms
    of compute at 65M/b8) it multiplies achievable steps/s by up to
    ``chain_steps``; on a local TPU host it removes per-step Python dispatch
    overhead. Composes with ``accum_steps`` (batch axes become
    ``(chain, accum, b, ...)``). The reference has no analog — its Lightning
    loop is one CUDA-graph-less launch sequence per step (train.py:105-125).
    """

    def step_fn(state: TrainState, batch, key: jax.Array):
        params0 = state.variables["params"]
        others0 = {k: v for k, v in state.variables.items() if k != "params"}

        if accum_steps > 1:
            keys = jax.random.split(key, accum_steps)

            def micro(carry, xs):
                grads_sum, loss_sum, others = carry
                mb, mkey = xs
                if preprocess is not None:
                    mb = preprocess(mb)

                def loss_of_params(p):
                    return model.loss_fn(
                        {**others, "params": p}, mb, mkey, train=True
                    )

                (mloss, mupdates), mgrads = jax.value_and_grad(
                    loss_of_params, has_aux=True
                )(params0)
                grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, mgrads)
                # mutable collections (e.g. batch stats) update sequentially
                return (grads_sum, loss_sum + mloss, {**others, **mupdates}), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params0)
            (grads, loss_sum, mutable_updates), _ = jax.lax.scan(
                micro, (zeros, jnp.zeros((), jnp.float32), others0), (batch, keys)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            loss = loss_sum / accum_steps
        else:
            if preprocess is not None:
                batch = preprocess(batch)

            def loss_of_params(params):
                variables = {**state.variables, "params": params}
                loss, updates = model.loss_fn(variables, batch, key, train=True)
                return loss, updates

            (loss, mutable_updates), grads = jax.value_and_grad(
                loss_of_params, has_aux=True
            )(params0)
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

    if chain_steps > 1:
        single_step = step_fn

        def step_fn(state: TrainState, batch, key: jax.Array):
            keys = jax.random.split(key, chain_steps)

            def body(st, xs):
                b, k = xs
                st, m = single_step(st, b, k)
                return st, m["train_loss"]

            state, losses = jax.lax.scan(body, state, (batch, keys))
            # "train_loss" stays the LAST update's loss so chained logging
            # reads like per-step logging at the same step count.
            return state, {"train_loss": losses[-1],
                           "train_loss_mean": jnp.mean(losses)}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    rep = replicated_sharding(mesh)
    # Leading scan axes shift the data-sharded batch axis right: axis 0 is
    # the chain index (if chained), then the microbatch index (if
    # accumulating), then the batch.
    lead = int(chain_steps > 1) + int(accum_steps > 1)
    bsh = batch_sharding(mesh) if lead == 0 else stacked_batch_sharding(mesh, lead)
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
