"""Metric-ranked checkpointing on orbax.

Functional twin of the reference's ModelCheckpoint stack (train.py:95-103):
save_last + top-10 by 'pesq' (max) + top-2 by 'si_sdr' (max) for the score
model; save_last + top-3 by 'snr_error' (min) for the SNR estimator
(train_snr_est.py:74-79). EMA state is stored inside the TrainState pytree
(the reference injects it via on_save_checkpoint, model.py:109-118), and
hyperparameters are persisted as JSON to enable load-with-overrides
(model.py:93, eval.py:94-97).
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import weakref
from typing import Any, Dict, List, Optional, Sequence

import jax
import orbax.checkpoint as ocp

# Async writers must be joined before interpreter shutdown (a pending
# serialization can't schedule threads once executors are torn down).
_LIVE_MANAGERS: "weakref.WeakSet[CheckpointManager]" = weakref.WeakSet()


@atexit.register
def _drain_pending_checkpoints() -> None:
    for mgr in list(_LIVE_MANAGERS):
        try:
            mgr.close()
        except Exception:
            pass


class CheckpointManager:
    """Keeps `last` plus the top-k steps for each monitored metric."""

    def __init__(
        self,
        directory: str,
        monitors: Sequence[dict] = (
            {"monitor": "pesq", "mode": "max", "top_k": 10},
            {"monitor": "si_sdr", "mode": "max", "top_k": 2},
        ),
        save_last: bool = True,
        hparams: Optional[dict] = None,
        async_save: bool = True,
    ):
        """With ``async_save`` (default), `save()` returns as soon as the
        device arrays are snapshotted and serialization proceeds in a
        background thread — the train loop keeps stepping while the ~260 MB
        state writes out. `wait_until_finished()` (or the next save) joins
        the pending write."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitors = list(monitors)
        self.save_last = save_last
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.StandardCheckpointer()
        self._closed = False
        _LIVE_MANAGERS.add(self)
        self._meta_path = os.path.join(self.directory, "metadata.json")
        self._meta: Dict[str, dict] = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self._meta = json.load(f)
            # metadata.json is written as soon as an async save is dispatched;
            # if the process died mid-serialization the entry references a
            # step whose directory was never committed (orbax renames the tmp
            # dir only on commit). Drop such entries so latest_step()/restore()
            # fall back to the newest intact checkpoint.
            stale = [
                k for k in self._meta
                if not os.path.isdir(self._step_dir(int(k)))
            ]
            for k in stale:
                del self._meta[k]
        if hparams is not None:
            with open(os.path.join(self.directory, "hparams.json"), "w") as f:
                json.dump(hparams, f, indent=2, default=str)

    # ------------------------------------------------------------------ paths
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def all_steps(self) -> List[int]:
        return sorted(int(k) for k in self._meta.keys())

    # ------------------------------------------------------------------- save
    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        path = self._step_dir(step)
        # Join any in-flight async write before touching the directory set
        # (pruning below must not race a pending serialization).
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, args=ocp.args.StandardSave(state))
        self._pending_step = step
        self._meta[str(step)] = metrics
        self._prune()
        with open(self._meta_path, "w") as f:
            json.dump(self._meta, f, indent=2)

    def wait_until_finished(self) -> None:
        """Block until any pending async checkpoint write has completed."""
        if not self._closed:
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        """Join pending writes and release the checkpointer's threads."""
        if self._closed:
            return
        self._closed = True
        self._ckptr.wait_until_finished()
        self._ckptr.close()

    def _retained_steps(self) -> set:
        keep = set()
        steps = self.all_steps()
        if not steps:
            return keep
        if self.save_last:
            keep.add(steps[-1])
        for mon in self.monitors:
            name, mode, top_k = mon["monitor"], mon["mode"], mon["top_k"]
            scored = [
                (s, self._meta[str(s)][name])
                for s in steps
                if name in self._meta[str(s)]
            ]
            scored.sort(key=lambda kv: kv[1], reverse=(mode == "max"))
            keep |= {s for s, _ in scored[:top_k]}
        return keep

    def _prune(self) -> None:
        keep = self._retained_steps()
        for s in self.all_steps():
            if s not in keep:
                # The step just issued may still be serializing (async); join
                # before deleting its directory (rare: only when the new step
                # is immediately outranked and save_last is off).
                if getattr(self, "_pending_step", None) == s:
                    self._ckptr.wait_until_finished()
                path = self._step_dir(s)
                if os.path.exists(path):
                    shutil.rmtree(path)
                del self._meta[str(s)]

    # ---------------------------------------------------------------- restore
    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def best_step(self, monitor: str, mode: str = "max") -> Optional[int]:
        scored = [
            (s, self._meta[str(s)][monitor])
            for s in self.all_steps()
            if monitor in self._meta[str(s)]
        ]
        if not scored:
            return None
        scored.sort(key=lambda kv: kv[1], reverse=(mode == "max"))
        return scored[0][0]

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore a checkpoint into the structure of `target` (an abstract or
        concrete pytree of the same shape)."""
        self._ckptr.wait_until_finished()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._ckptr.restore(
            self._step_dir(step), args=ocp.args.StandardRestore(target)
        )

    def load_hparams(self) -> Optional[dict]:
        path = os.path.join(self.directory, "hparams.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
