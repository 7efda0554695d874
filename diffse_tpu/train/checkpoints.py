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

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Sequence

import jax
import orbax.checkpoint as ocp


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
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitors = list(monitors)
        self.save_last = save_last
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.directory, "metadata.json")
        self._meta: Dict[str, dict] = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self._meta = json.load(f)
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
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        self._meta[str(step)] = metrics
        self._prune()
        with open(self._meta_path, "w") as f:
            json.dump(self._meta, f, indent=2)

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
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._ckptr.restore(self._step_dir(step), target=target)

    def load_hparams(self) -> Optional[dict]:
        path = os.path.join(self.directory, "hparams.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
