"""Dynamic-batching enhancement service: the framework's production serving
runtime.

The reference has no serving story — its only inference surface is the
per-utterance ``model.enhance`` loop in eval.py:126-132 (one utterance, one
GPU, one call). On TPU, per-request dispatch wastes the chip: the measured
optimum is ONE fixed-shape chunk program fed by batches pooled across
utterances (packed fleet serving, evaluation/streaming.py, DEVNOTES round 3).
This module puts a concurrent request front on that engine:

- :class:`EnhanceService` accepts requests from any number of client threads
  (``submit`` returns a future; ``enhance`` blocks). A single dispatcher
  thread collects requests into *flights* — up to ``max_flight_utts``
  utterances or ``max_wait_ms`` of linger, whichever first — and runs each
  flight through :func:`enhance_streamed_packed`, which pools the flight's
  spec chunks into MXU-aligned batches of the one hot program. JAX dispatch
  stays single-threaded (one dispatcher), which is both required (the jit
  cache is per-model) and optimal (device execution pipelines across the
  flight's batches; a second dispatcher would only contend).
- SNR-adaptive branches (``*_snr``): per-utterance SNR estimation runs in the
  dispatcher before packing, via the model's own estimator
  (``ScoreModel.estimate_snr``) unless the request carries an oracle value.
- Observability: :meth:`stats` reports requests, flights, occupancy, audio
  seconds, wall time and the serving real-time factor.

The HTTP front end lives in :mod:`diffse_tpu.serving.http`; the CLI is
``serve.py`` at the repo root.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import numpy as np


@dataclasses.dataclass
class ServiceConfig:
    """Serving knobs (defaults are the measured production settings:
    chunk 64 / overlap 2 / batch 16, DEVNOTES round 3)."""

    chunk_frames: int = 64
    overlap_frames: int = 2
    batch_size: int = 16
    max_flight_utts: int = 16
    max_wait_ms: float = 25.0
    seed: int = 0


class _Request:
    __slots__ = ("y", "est_snr", "future")

    def __init__(self, y: np.ndarray, est_snr: Optional[float]):
        self.y = y
        self.est_snr = est_snr
        self.future: Future = Future()


_CLOSE = object()


class EnhanceService:
    """Thread-safe dynamic batcher over the packed fleet serving engine."""

    def __init__(self, model, variables, model_type: Optional[str] = None,
                 config: Optional[ServiceConfig] = None):
        from ..train.loop import eval_model_type

        self.model = model
        self.variables = variables
        self.cfg = config or ServiceConfig()
        self.model_type = model_type or eval_model_type(
            model.cfg.snr_conditioned, model.cfg.model_type
        )
        self._needs_snr = self.model_type.endswith("_snr")
        self._q: queue.Queue = queue.Queue()
        self._base_key = jax.random.PRNGKey(self.cfg.seed)
        self._flight_idx = 0
        self._closed = False
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "flights": 0,
            "audio_seconds": 0.0,
            "wall_seconds": 0.0,
            "errors": 0,
        }
        self._dispatcher = threading.Thread(target=self._run, daemon=True)
        self._dispatcher.start()

    # ------------------------------------------------------------- client API
    def submit(self, y_wav: np.ndarray, est_snr: Optional[float] = None) -> Future:
        """Enqueue one utterance; resolves to the enhanced float32 waveform
        (same length as the input). ``est_snr`` optionally supplies an oracle
        SNR for the ``*_snr`` branches (else the service estimates it)."""
        if self._closed:
            raise RuntimeError("service is closed")
        y = np.asarray(y_wav, dtype=np.float32).reshape(-1)
        if y.size == 0:
            raise ValueError("empty waveform")
        req = _Request(y, est_snr)
        self._q.put(req)
        return req.future

    def enhance(self, y_wav: np.ndarray, est_snr: Optional[float] = None,
                timeout: Optional[float] = None) -> np.ndarray:
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(y_wav, est_snr).result(timeout=timeout)

    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
        s["occupancy"] = s["requests"] / s["flights"] if s["flights"] else 0.0
        s["rtf_x_realtime"] = (
            s["audio_seconds"] / s["wall_seconds"] if s["wall_seconds"] else 0.0
        )
        s["queue_depth"] = self._q.qsize()
        return s

    def close(self, timeout: float = 30.0) -> None:
        """Stop accepting work, drain in-queue requests, join the dispatcher."""
        if self._closed:
            return
        self._closed = True
        self._q.put(_CLOSE)
        self._dispatcher.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -------------------------------------------------------------- dispatcher
    def _collect_flight(self):
        """Block for the first request, then linger up to max_wait_ms for
        more, capped at max_flight_utts. Returns (requests, saw_close)."""
        try:
            first = self._q.get(timeout=0.25)
        except queue.Empty:
            return [], False
        if first is _CLOSE:
            return [], True
        flight = [first]
        deadline = time.monotonic() + self.cfg.max_wait_ms / 1000.0
        while len(flight) < self.cfg.max_flight_utts:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is _CLOSE:
                return flight, True
            flight.append(item)
        return flight, False

    def _run_flight(self, flight) -> None:
        import jax.numpy as jnp

        from ..evaluation.streaming import enhance_streamed_packed

        t0 = time.monotonic()
        est_snrs = None
        if self._needs_snr:
            est_snrs = [
                r.est_snr if r.est_snr is not None
                else float(self.model.estimate_snr(jnp.asarray(r.y)[None])[0])
                for r in flight
            ]
        key = jax.random.fold_in(self._base_key, self._flight_idx)
        self._flight_idx += 1
        outs = enhance_streamed_packed(
            self.model, self.variables, [r.y for r in flight], self.model_type,
            key, chunk_frames=self.cfg.chunk_frames,
            overlap_frames=self.cfg.overlap_frames,
            batch_size=self.cfg.batch_size, est_snrs=est_snrs,
            fixed_snr=self.model.cfg.fixed_snr,
        )
        wall = time.monotonic() - t0
        for r, out in zip(flight, outs):
            r.future.set_result(np.asarray(out, dtype=np.float32))
        with self._lock:
            self._stats["requests"] += len(flight)
            self._stats["flights"] += 1
            self._stats["audio_seconds"] += sum(
                r.y.shape[-1] for r in flight) / 16000.0
            self._stats["wall_seconds"] += wall

    def _run(self) -> None:
        while True:
            flight, saw_close = self._collect_flight()
            if flight:
                try:
                    self._run_flight(flight)
                except Exception as e:  # resolve, never wedge clients
                    with self._lock:
                        self._stats["errors"] += 1
                    for r in flight:
                        if not r.future.done():
                            r.future.set_exception(e)
            if saw_close:
                # drain anything that raced past close()
                while True:
                    try:
                        item = self._q.get_nowait()
                    except queue.Empty:
                        return
                    if item is not _CLOSE and not item.future.done():
                        item.future.set_exception(
                            RuntimeError("service closed"))
