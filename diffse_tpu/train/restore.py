"""Checkpoint restoration helpers.

The analog of ``ScoreModel.load_from_checkpoint(ckpt, **overrides)``
(eval.py:94-97): reconstruct the model from the persisted hyperparameters,
rebuild an abstract TrainState, and restore weights + EMA + optimizer state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
import optax

from ..models.score_model import ScoreModel
from ..models.snr_model import SNRModel
from .checkpoints import CheckpointManager
from .state import TrainState, create_train_state


def _restore_state(mgr: CheckpointManager, model, step: Optional[int],
                   monitor: Optional[str], mode: str) -> TrainState:
    if step is None and monitor is not None:
        step = mgr.best_step(monitor, mode=mode)
    # Build the restore target abstractly: eval_shape traces the init +
    # optimizer-state construction without executing anything, and the
    # target tree is host numpy zeros. This keeps restore completely off
    # the accelerator (no init compile, no device->host fetch — the fetch
    # path is also fragile over the axon TPU bridge).
    key_spec = jax.ShapeDtypeStruct((2,), np.uint32)
    abstract = jax.eval_shape(
        lambda k: create_train_state(model.init_variables(k),
                                     optax.adam(model.cfg.lr)),
        key_spec,
    )
    target = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), abstract
    )
    return mgr.restore(target, step=step)


def load_score_model(
    ckpt_dir: str,
    step: Optional[int] = None,
    monitor: Optional[str] = None,
    mode: str = "max",
    snr_model=None,
    **config_overrides,
) -> Tuple[ScoreModel, TrainState]:
    """Load a ScoreModel + TrainState from a checkpoint directory.

    config_overrides are splatted over the stored config (the reference's
    load_from_checkpoint(ckpt, batch_size=16, ...) pattern)."""
    mgr = CheckpointManager(ckpt_dir)
    hparams = mgr.load_hparams()
    if hparams is None:
        raise FileNotFoundError(f"no hparams.json in {ckpt_dir}")
    model = ScoreModel.from_hparams(hparams, snr_model=snr_model, **config_overrides)
    state = _restore_state(mgr, model, step, monitor, mode)
    return model, state


def load_snr_model(
    ckpt_dir: str,
    step: Optional[int] = None,
    monitor: Optional[str] = "snr_error",
    mode: str = "min",
    **config_overrides,
) -> Tuple[SNRModel, TrainState]:
    mgr = CheckpointManager(ckpt_dir)
    hparams = mgr.load_hparams()
    if hparams is None:
        raise FileNotFoundError(f"no hparams.json in {ckpt_dir}")
    model = SNRModel.from_hparams(hparams, **config_overrides)
    try:
        state = _restore_state(mgr, model, step, monitor, mode)
    except Exception:
        state = _restore_state(mgr, model, step, None, mode)
    return model, state
