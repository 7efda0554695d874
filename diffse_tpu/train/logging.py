"""Metric logging: JSONL + stdout, optional wandb.

Replaces the reference's WandbLogger wiring (train.py:80-88) with a local-first
logger that writes one JSON object per log call (the same metric names:
train_loss, valid_loss, pesq, si_sdr, estoi, pesq_-5..estoi_35, snr_error) and
mirrors to wandb when the package is importable and --wandb is requested.
Artifact parity with the reference's ``log_model=True`` + ``log_code``
(train.py:82-83): on init the repo code snapshot is uploaded via
``wandb.run.log_code``; the train loop uploads the checkpoint directory as a
wandb model Artifact at the end of training (``log_artifact``).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                 project: str = "diffse_tpu", run_name: Optional[str] = None,
                 config: Optional[dict] = None):
        self._file = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                run = wandb.init(project=project, name=run_name,
                                 config=config or {})
                # code-snapshot parity with the reference's log_code
                # (train.py:83): upload the repo's .py files with the run
                try:
                    code_root = os.path.dirname(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))))
                    run.log_code(code_root)
                except Exception:
                    pass
            except Exception:
                print("wandb unavailable; falling back to JSONL logging", file=sys.stderr)

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        record = {"ts": time.time()}
        if step is not None:
            record["step"] = int(step)
        record.update({k: float(v) for k, v in metrics.items()})
        line = json.dumps(record)
        print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def log_artifact(self, path: str, name: str = "model",
                     type: str = "model") -> None:
        """Upload a file or directory as a wandb Artifact — the analog of the
        reference's ``log_model=True`` checkpoint upload (train.py:82). No-op
        without an active wandb run."""
        if not (self._wandb and getattr(self._wandb, "run", None)):
            return
        try:
            art = self._wandb.Artifact(name, type=type)
            if os.path.isdir(path):
                art.add_dir(path)
            else:
                art.add_file(path)
            self._wandb.run.log_artifact(art)
        except Exception as e:
            print(f"wandb artifact upload failed: {e}", file=sys.stderr)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._wandb:
            self._wandb.finish()
