"""Metric logging: JSONL + stdout, optional wandb.

Replaces the reference's WandbLogger wiring (train.py:80-88) with a local-first
logger that writes one JSON object per log call (the same metric names:
train_loss, valid_loss, pesq, si_sdr, estoi, pesq_-5..estoi_35, snr_error) and
mirrors to wandb when the package is importable and --wandb is requested.
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
                wandb.init(project=project, name=run_name, config=config or {})
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

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._wandb:
            self._wandb.finish()
