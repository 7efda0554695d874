"""Training loops: the functional twin of Lightning's Trainer.fit wiring
(train.py:105-125, train_snr_est.py:82-102) with:

  - epochs over the threaded DataLoader, each optimizer step one jitted XLA
    program (preprocess + loss + grads + Adam + EMA),
  - data-parallel sharding over a device mesh,
  - per-epoch validation: valid loss, evaluate_model (PESQ/SI-SDR/ESTOI) and
    the 9-SNR deep sweep every `deep_inference_every_epoch` epochs
    (model.py:402-477),
  - metric-ranked checkpointing (top-10 pesq / top-2 si_sdr / last, or
    top-3 min snr_error for the SNR estimator) and resume.
"""

from __future__ import annotations

import signal
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..evaluation.deep_inference import SNR_GRID, deep_evaluate_model
from ..evaluation.inference import evaluate_model
from ..parallel import make_mesh, replicate, shard_batch, stacked_batch_sharding
from .checkpoints import CheckpointManager
from .logging import MetricsLogger
from .state import create_train_state, eval_variables
from .steps import make_eval_step, make_train_step

DEEP_INFERENCE_EVERY_EPOCH = 10


def _maybe_mesh(use_mesh: bool, batch_size: int, tp_size: int = 1):
    """Data-parallel mesh if requested, more than one device exists, and the
    batch divides evenly over the data axis (sharding requires divisibility).
    tp_size > 1 builds a 2-D (data, model) mesh instead: the model axis
    carries tensor-parallel kernel shards (parallel/model_sharding.py)."""
    if not use_mesh:
        return None
    n = len(jax.devices())
    if n <= 1:
        return None
    if tp_size > 1:
        from ..parallel.model_sharding import make_2d_mesh

        if n % tp_size != 0:
            print(f"warning: {n} devices not divisible by tp_size {tp_size}; "
                  "running without sharding")
            return None
        n_data = n // tp_size
        if batch_size % n_data != 0:
            print(f"warning: batch_size {batch_size} not divisible by the "
                  f"{n_data}-way data axis; running without sharding")
            return None
        return make_2d_mesh(n_data, tp_size)
    if batch_size % n != 0:
        print(f"warning: batch_size {batch_size} not divisible by {n} devices; "
              "running without data-parallel sharding")
        return None
    return make_mesh()


class _PreemptionGuard:
    """Preemption-safe training: TPU VMs receive SIGTERM shortly before the
    machine is reclaimed. While installed, SIGTERM sets a flag instead of
    killing the process; the train loop checks it each step, saves a final
    checkpoint, and returns cleanly so `--resume` continues from it. (The
    reference has no preemption story — Lightning just dies, train.py:120-125;
    recovery there is manual resume from the last *epoch* checkpoint.)"""

    def __init__(self):
        self.triggered = False
        self._prev = None
        self._installed = False

    def __enter__(self):
        try:
            self._prev = signal.signal(signal.SIGTERM, self._on_signal)
            self._installed = True
        except ValueError:
            # not the main thread (e.g. a test harness): run unguarded
            self._installed = False
        return self

    def _on_signal(self, signum, frame):
        self.triggered = True

    def __exit__(self, *exc):
        if self._installed:
            # getsignal() returns None for handlers installed by non-Python
            # code; signal.signal(None) would raise — fall back to SIG_DFL.
            prev = self._prev if self._prev is not None else signal.SIG_DFL
            signal.signal(signal.SIGTERM, prev)
        return False


def _stack_groups(loader, k: int):
    """Group k consecutive loader batches into one super-batch with a leading
    microbatch axis (k, b, ...) for gradient accumulation. A trailing group
    that is incomplete or ragged (the epoch's short last batch) is dropped —
    it would change the compiled shape."""
    buf = []
    for b in loader:
        buf.append(b)
        if len(buf) == k:
            uniform = all(
                np.shape(bb[i]) == np.shape(buf[0][i])
                for bb in buf
                for i in range(len(buf[0]))
            )
            if uniform:
                yield tuple(
                    np.stack([np.asarray(bb[i]) for bb in buf])
                    for i in range(len(buf[0]))
                )
            buf = []


def eval_model_type(snr_conditioned: str, model_type: str) -> str:
    """(snr_conditioned, model_type) -> evaluate_model branch name
    (model.py:409-426)."""
    if snr_conditioned == "false":
        return model_type
    if snr_conditioned == "fixed":
        return f"{model_type}_fixed"
    if snr_conditioned == "true":
        return f"{model_type}_snr"
    raise ValueError(snr_conditioned)


def train_score_model(
    model,
    data_module,
    max_epochs: int = 1,
    ckpt_dir: Optional[str] = None,
    logger: Optional[MetricsLogger] = None,
    seed: int = 0,
    use_mesh: bool = True,
    log_every_n_steps: int = 10,
    resume: bool = False,
    max_steps_per_epoch: Optional[int] = None,
    variables=None,
    tp_size: int = 1,
    eval_batch_size: int = 1,
    accum_steps: int = 1,
    eval_every_n_epochs: int = 1,
    chain_steps: int = 1,
):
    """Train a ScoreModel; returns the final TrainState.

    `variables` lets the caller pass pre-initialized backbone variables
    (e.g. initialized on the host CPU backend to avoid a large one-off
    on-device init compile); default None initializes from `seed`.
    `tp_size` > 1 trains tensor-parallel over a 2-D (data, model) mesh
    (beyond the reference's DP-only scaling; parallel/model_sharding.py).
    `accum_steps` > 1 accumulates gradients over that many consecutive
    loader batches before each optimizer step (effective batch
    `accum_steps * batch_size` in the HBM footprint of one batch).
    `eval_every_n_epochs` runs validation/eval/checkpointing only every
    k-th epoch (and always on the last) — the analog of the Lightning
    trainer's `check_val_every_n_epoch` the reference drives its loop
    with; epochs over small datasets are seconds of compute while each
    checkpoint save is a full state fetch, so long runs set k > 1.
    `chain_steps` > 1 fuses that many consecutive optimizer updates into
    one dispatched program (train/steps.py chain scan) — the wall-time
    lever when per-dispatch latency dominates step compute (the axon
    bridge). `max_steps_per_epoch` and `log_every_n_steps` then count
    dispatches (each = `chain_steps` updates).
    """
    cfg = model.cfg
    logger = logger or MetricsLogger()
    data_module.setup("fit")

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    if variables is None:
        variables = model.init_variables(init_key)

    optimizer = optax.adam(cfg.lr)
    state = create_train_state(variables, optimizer)

    mesh = _maybe_mesh(use_mesh, data_module.cfg.batch_size, tp_size)
    state_sharding = None
    if mesh is not None and "model" in mesh.axis_names:
        from ..parallel.model_sharding import state_shardings

        state_sharding = state_shardings(mesh, state)
    train_step = make_train_step(
        model, optimizer, ema_decay=cfg.ema_decay, mesh=mesh,
        preprocess=model.prepare_batch, donate=True,
        state_sharding=state_sharding, accum_steps=accum_steps,
        chain_steps=chain_steps,
    )
    valid_step = make_eval_step(model, preprocess=model.prepare_batch)

    ckpt_mgr = None
    start_epoch = 0
    if ckpt_dir:
        ckpt_mgr = CheckpointManager(
            ckpt_dir,
            monitors=[
                {"monitor": "pesq", "mode": "max", "top_k": 10},
                {"monitor": "si_sdr", "mode": "max", "top_k": 2},
            ],
            hparams=model.hparams,
        )
        if resume and ckpt_mgr.latest_step() is not None:
            state = ckpt_mgr.restore(state)
            # Continue the epoch numbering: checkpoint keys must strictly
            # increase across resumes, or a later (mid-epoch) save under a
            # reused small key is instantly outranked by the stale higher
            # key and pruned — restore() would then return pre-resume state.
            start_epoch = ckpt_mgr.latest_step() + 1

    if mesh is not None:
        if state_sharding is not None:
            state = jax.tree_util.tree_map(jax.device_put, state, state_sharding)
        else:
            state = replicate(mesh, state)

    mt = eval_model_type(cfg.snr_conditioned, cfg.model_type)

    def _preempt_exit(epoch):
        step_no = int(state.step)
        if ckpt_mgr is not None:
            print(f"SIGTERM: checkpointing at step {step_no} and exiting "
                  "(resume with --resume)")
            host_state = jax.tree_util.tree_map(np.asarray, state)
            ckpt_mgr.save(epoch, host_state, {})
            ckpt_mgr.wait_until_finished()
        else:
            print(f"SIGTERM: exiting at step {step_no} "
                  "(no --ckpt_dir, nothing checkpointed)")
        return state

    guard = _PreemptionGuard()
    _warned_empty_epoch = False
    with guard:
      for epoch in range(start_epoch, max_epochs):
        # ---- train epoch
        loader = data_module.train_dataloader()
        if accum_steps > 1:
            loader = _stack_groups(loader, accum_steps)
        if chain_steps > 1:
            loader = _stack_groups(loader, chain_steps)
        lead_axes = int(chain_steps > 1) + int(accum_steps > 1)
        stepped = False
        for i, batch in enumerate(loader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            stepped = True
            key, step_key = jax.random.split(key)
            jbatch = tuple(jnp.asarray(b) for b in batch)
            if mesh is not None:
                jbatch = shard_batch(
                    mesh, jbatch,
                    spec=None if lead_axes == 0
                    else stacked_batch_sharding(mesh, lead_axes),
                )
            state, metrics = train_step(state, jbatch, step_key)
            if guard.triggered:
                return _preempt_exit(epoch)
            if i % log_every_n_steps == 0:
                rec = {"epoch": epoch, "train_loss": metrics["train_loss"]}
                if "train_loss_mean" in metrics:
                    # chained dispatch: "train_loss" samples only the LAST of
                    # chain_steps updates; also log the mean over the chain.
                    rec["train_loss_mean"] = metrics["train_loss_mean"]
                logger.log(rec, step=int(state.step))
        if not stepped and not _warned_empty_epoch:
            # _stack_groups drops ragged tails: an epoch with fewer than
            # accum_steps*chain_steps batches trains ZERO steps but would
            # still validate and checkpoint below.
            _warned_empty_epoch = True
            print(
                f"warning: epoch {epoch} produced no training steps — the "
                f"dataset yields fewer than accum_steps*chain_steps "
                f"(= {accum_steps * chain_steps}) batches per epoch; lower "
                "--accum_steps/--chain_steps or add data"
            )
        if guard.triggered:  # SIGTERM landed while fetching/stacking batches
            return _preempt_exit(epoch)

        if (epoch + 1) % eval_every_n_epochs != 0 and epoch != max_epochs - 1:
            continue  # off-cadence epoch: no validation, no save

        # ---- validation (EMA weights, model.py:120-134)
        ev = eval_variables(state)
        val_losses = []
        for batch in data_module.val_dataloader():
            key, vkey = jax.random.split(key)
            jbatch = tuple(jnp.asarray(b) for b in batch)
            m = valid_step(ev, jbatch, vkey)
            val_losses.append(float(m["valid_loss"]))
        epoch_metrics = {"valid_loss": float(np.mean(val_losses))} if val_losses else {}

        run_eval = cfg.num_eval_files != 0
        if run_eval and mt.endswith("_snr") and model.snr_model is None:
            # the reference hard-loads the SNR-estimator checkpoint at import
            # (model.py:25-30); here it must be injected (--snr_ckpt)
            print("warning: snr_conditioned='true' but no snr_model injected; "
                  "skipping speech-enhancement validation metrics")
            run_eval = False
        if run_eval:
            key, ekey = jax.random.split(key)
            pesq_v, si_sdr_v, estoi_v = evaluate_model(
                model, ev, data_module, cfg.num_eval_files, model_type=mt,
                fixed_snr=cfg.fixed_snr, key=ekey,
                batch_size=eval_batch_size,
            )
            epoch_metrics.update({"pesq": pesq_v, "si_sdr": si_sdr_v, "estoi": estoi_v})

            if (
                cfg.snr_conditioned != "fixed"
                and epoch % DEEP_INFERENCE_EVERY_EPOCH == 0
                and epoch >= DEEP_INFERENCE_EVERY_EPOCH
            ):
                key, dkey = jax.random.split(key)
                vals = deep_evaluate_model(
                    model, ev, data_module, cfg.num_eval_files, model_type=mt,
                    fixed_snr=cfg.fixed_snr, key=dkey,
                )
                n = len(SNR_GRID)
                # logged as *_-5 .. *_35 (effective input SNR; model.py:449-477)
                labels = ["-5", "00", "05", "10", "15", "20", "25", "30", "35"]
                for j, lab in enumerate(labels):
                    epoch_metrics[f"si_sdr_{lab}"] = vals[j]
                    epoch_metrics[f"pesq_{lab}"] = vals[n + j]
                    epoch_metrics[f"estoi_{lab}"] = vals[2 * n + j]

        sanitized = {k: v for k, v in epoch_metrics.items() if np.isfinite(v)}
        logger.log({"epoch": epoch, **sanitized}, step=int(state.step))
        if ckpt_mgr is not None:
            host_state = jax.tree_util.tree_map(np.asarray, state)
            ckpt_mgr.save(epoch, host_state, sanitized)
        if guard.triggered:
            # SIGTERM landed during validation/eval: the end-of-epoch save
            # above already captured this state (with metrics) — just exit.
            print(f"SIGTERM during validation: exiting after the epoch-{epoch}"
                  " checkpoint (resume with --resume)")
            if ckpt_mgr is not None:
                ckpt_mgr.wait_until_finished()
            return state

    if ckpt_mgr is not None:
        ckpt_mgr.wait_until_finished()
        # model-artifact parity with the reference's log_model=True
        # (train.py:82): upload the final checkpoint directory when a wandb
        # run is active (no-op otherwise)
        logger.log_artifact(ckpt_dir, name="score_model")
    return state


def train_snr_model(
    model,
    data_module,
    max_epochs: int = 1,
    ckpt_dir: Optional[str] = None,
    logger: Optional[MetricsLogger] = None,
    seed: int = 0,
    use_mesh: bool = True,
    log_every_n_steps: int = 10,
    resume: bool = False,
    max_steps_per_epoch: Optional[int] = None,
):
    """Train the SNR estimator (train_snr_est.py:82-102)."""
    cfg = model.cfg
    logger = logger or MetricsLogger()
    data_module.setup("fit")

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    variables = model.init_variables(init_key)

    optimizer = optax.adam(cfg.lr)
    state = create_train_state(variables, optimizer)

    mesh = _maybe_mesh(use_mesh, data_module.cfg.batch_size)
    train_step = make_train_step(
        model, optimizer, ema_decay=cfg.ema_decay, mesh=mesh,
        preprocess=model.prepare_batch, donate=True,
    )
    valid_metrics = jax.jit(
        lambda v, b: model.valid_metrics(v, model.prepare_batch(b))
    )

    ckpt_mgr = None
    start_epoch = 0
    if ckpt_dir:
        ckpt_mgr = CheckpointManager(
            ckpt_dir,
            monitors=[{"monitor": "snr_error", "mode": "min", "top_k": 3}],
            hparams=model.hparams,
        )
        if resume and ckpt_mgr.latest_step() is not None:
            state = ckpt_mgr.restore(state)
            start_epoch = ckpt_mgr.latest_step() + 1  # keys must increase
    if mesh is not None:
        state = replicate(mesh, state)

    def _preempt_exit(epoch):
        step_no = int(state.step)
        if ckpt_mgr is not None:
            print(f"SIGTERM: checkpointing at step {step_no} and exiting "
                  "(resume with --resume)")
            host_state = jax.tree_util.tree_map(np.asarray, state)
            ckpt_mgr.save(epoch, host_state, {})
            ckpt_mgr.wait_until_finished()
        else:
            print(f"SIGTERM: exiting at step {step_no} "
                  "(no --ckpt_dir, nothing checkpointed)")
        return state

    guard = _PreemptionGuard()
    with guard:
      for epoch in range(start_epoch, max_epochs):
        for i, batch in enumerate(data_module.train_dataloader()):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            key, step_key = jax.random.split(key)
            jbatch = tuple(jnp.asarray(b) for b in batch)
            if mesh is not None:
                jbatch = shard_batch(mesh, jbatch)
            state, metrics = train_step(state, jbatch, step_key)
            if guard.triggered:
                return _preempt_exit(epoch)
            if i % log_every_n_steps == 0:
                logger.log({"epoch": epoch, "train_loss": metrics["train_loss"]},
                           step=int(state.step))
        if guard.triggered:
            return _preempt_exit(epoch)

        ev = eval_variables(state)
        accum = {"valid_loss": [], "snr_error": []}
        for batch in data_module.val_dataloader():
            jbatch = tuple(jnp.asarray(b) for b in batch)
            m = valid_metrics(ev, jbatch)
            for k in accum:
                accum[k].append(float(m[k]))
        epoch_metrics = {k: float(np.mean(v)) for k, v in accum.items() if v}
        logger.log({"epoch": epoch, **epoch_metrics}, step=int(state.step))
        if ckpt_mgr is not None:
            host_state = jax.tree_util.tree_map(np.asarray, state)
            ckpt_mgr.save(epoch, host_state, epoch_metrics)
        if guard.triggered:
            print(f"SIGTERM during validation: exiting after the epoch-{epoch}"
                  " checkpoint (resume with --resume)")
            if ckpt_mgr is not None:
                ckpt_mgr.wait_until_finished()
            return state

    if ckpt_mgr is not None:
        ckpt_mgr.wait_until_finished()
        logger.log_artifact(ckpt_dir, name="snr_model")
    return state
