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

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import numpy as np


class RequestTooLarge(ValueError):
    """Request audio exceeds ``ServiceConfig.max_audio_seconds`` (HTTP 413)."""


class ServiceOverloaded(RuntimeError):
    """Queue full or the request aged out before dispatch (HTTP 503)."""


class FlightTimeout(RuntimeError):
    """A flight exceeded ``ServiceConfig.flight_timeout_s`` (HTTP 504)."""


@dataclasses.dataclass
class ServiceConfig:
    """Serving knobs (defaults are the measured production settings:
    chunk 64 / overlap 2 / batch 16, DEVNOTES round 3).

    Failure-mode limits (all disable with ``None``):

    - ``max_audio_seconds``: reject a single request longer than this at
      submit time (:class:`RequestTooLarge`).
    - ``max_queue_utts``: reject new requests once this many are already
      queued (:class:`ServiceOverloaded`) — sheds load instead of building an
      unbounded backlog behind a saturated chip.
    - ``max_queue_seconds``: a request that waits longer than this in the
      queue is failed with :class:`ServiceOverloaded` when the dispatcher
      reaches it — the client has usually given up by then, and enhancing for
      a dead socket wastes chip time.
    - ``flight_timeout_s``: if a flight's device execution exceeds this, its
      clients are failed with :class:`FlightTimeout`. The device program
      itself cannot be cancelled — the dispatcher unblocks the CLIENTS, then
      still waits for the program to finish before dispatching the next
      flight (JAX dispatch stays single-threaded); the queue-age limit
      protects requests queued behind the stall.
    """

    chunk_frames: int = 64
    overlap_frames: int = 2
    batch_size: int = 16
    max_flight_utts: int = 16
    max_wait_ms: float = 25.0
    seed: int = 0
    max_audio_seconds: Optional[float] = 600.0
    max_queue_utts: Optional[int] = 256
    max_queue_seconds: Optional[float] = 30.0
    flight_timeout_s: Optional[float] = None
    # bbed-branch sampler-config overrides forwarded to the chunk engine —
    # e.g. the quality-certified NFE-reduction config
    # {"predictor": "heun", "corrector": "none", "N": 15}
    # (SAMPLER_QUALITY.json, tools/sampler_quality.py). None = the
    # reference eval sampler (reverse_diffusion+ald, N=30).
    sampler_kwargs: Optional[dict] = None
    # how many recent per-request end-to-end latencies (submit -> result)
    # the p50/p95/p99 SLO window in stats() covers
    latency_window: int = 2048


class _Request:
    __slots__ = ("y", "est_snr", "future", "t_submit")

    def __init__(self, y: np.ndarray, est_snr: Optional[float]):
        self.y = y
        self.est_snr = est_snr
        self.future: Future = Future()
        self.t_submit = time.monotonic()


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
        self._dead = False
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "flights": 0,
            "audio_seconds": 0.0,
            "wall_seconds": 0.0,
            "errors": 0,
            "rejected": 0,
            "expired": 0,
            "flight_timeouts": 0,
        }
        # end-to-end (submit -> result) latencies of recent requests, seconds
        self._latencies = collections.deque(maxlen=self.cfg.latency_window)
        self._dispatcher = threading.Thread(target=self._run, daemon=True)
        self._dispatcher.start()

    # ------------------------------------------------------------- client API
    def submit(self, y_wav: np.ndarray, est_snr: Optional[float] = None) -> Future:
        """Enqueue one utterance; resolves to the enhanced float32 waveform
        (same length as the input). ``est_snr`` optionally supplies an oracle
        SNR for the ``*_snr`` branches (else the service estimates it)."""
        if self._closed:
            raise RuntimeError("service is closed")
        if self._dead:
            raise RuntimeError("service dispatcher died; service is unusable")
        y = np.asarray(y_wav, dtype=np.float32).reshape(-1)
        if y.size == 0:
            raise ValueError("empty waveform")
        max_s = self.cfg.max_audio_seconds
        if max_s is not None and y.size > max_s * 16000:
            with self._lock:
                self._stats["rejected"] += 1
            raise RequestTooLarge(
                f"request audio {y.size / 16000:.1f}s exceeds "
                f"max_audio_seconds={max_s:g}")
        cap = self.cfg.max_queue_utts
        if cap is not None and self._q.qsize() >= cap:
            with self._lock:
                self._stats["rejected"] += 1
            raise ServiceOverloaded(
                f"queue full ({cap} utterances waiting); retry later")
        req = _Request(y, est_snr)
        self._q.put(req)
        if self._dead and not req.future.done():
            # the dispatcher died while we were enqueueing and its final
            # drain may have already run — fail rather than hang the client
            req.future.set_exception(
                RuntimeError("service dispatcher died; service is unusable"))
        return req.future

    def enhance(self, y_wav: np.ndarray, est_snr: Optional[float] = None,
                timeout: Optional[float] = None) -> np.ndarray:
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(y_wav, est_snr).result(timeout=timeout)

    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
            lat = list(self._latencies)
        s["occupancy"] = s["requests"] / s["flights"] if s["flights"] else 0.0
        s["rtf_x_realtime"] = (
            s["audio_seconds"] / s["wall_seconds"] if s["wall_seconds"] else 0.0
        )
        s["queue_depth"] = self._q.qsize()
        # per-request end-to-end latency SLO window (submit -> result over
        # the last latency_window requests): the numbers a queue-depth /
        # linger knob is validated against
        if lat:
            a = np.asarray(lat)
            s["latency_ms"] = {
                "count": int(a.size),
                "p50": round(float(np.percentile(a, 50)) * 1000.0, 1),
                "p95": round(float(np.percentile(a, 95)) * 1000.0, 1),
                "p99": round(float(np.percentile(a, 99)) * 1000.0, 1),
                "max": round(float(a.max()) * 1000.0, 1),
            }
        else:
            s["latency_ms"] = None
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
    def _expire_if_stale(self, req) -> bool:
        """Fail a request that outwaited max_queue_seconds in the queue;
        returns True if it was expired."""
        lim = self.cfg.max_queue_seconds
        if lim is None or (time.monotonic() - req.t_submit) <= lim:
            return False
        with self._lock:
            self._stats["expired"] += 1
        if not req.future.done():
            req.future.set_exception(ServiceOverloaded(
                f"request waited > max_queue_seconds={lim:g}s in queue; "
                "service overloaded"))
        return True

    def _collect_flight(self):
        """Block for the first (still-live) request, then linger up to
        max_wait_ms for more, capped at max_flight_utts. Requests that aged
        past max_queue_seconds are failed and skipped. Returns
        (requests, saw_close)."""
        first = None
        while first is None:
            try:
                item = self._q.get(timeout=0.25)
            except queue.Empty:
                return [], False
            if item is _CLOSE:
                return [], True
            if not self._expire_if_stale(item):
                first = item
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
            if not self._expire_if_stale(item):
                flight.append(item)
        return flight, False

    def _run_flight(self, flight) -> None:
        """Execute one flight, honoring flight_timeout_s: on timeout the
        flight's clients are failed immediately, then the dispatcher still
        waits for the device program to finish (single-threaded JAX dispatch)
        before the next flight."""
        timeout = self.cfg.flight_timeout_s
        if timeout is None:
            self._execute_flight(flight)
            return
        worker = threading.Thread(
            target=self._execute_flight_guarded, args=(flight,), daemon=True)
        worker.start()
        worker.join(timeout)
        if worker.is_alive():
            with self._lock:
                self._stats["flight_timeouts"] += 1
            err = FlightTimeout(
                f"flight of {len(flight)} utterances exceeded "
                f"flight_timeout_s={timeout:g}s")
            for r in flight:
                if not r.future.done():
                    r.future.set_exception(err)
            worker.join()  # wait out the stuck program before the next flight

    def _execute_flight_guarded(self, flight) -> None:
        """_execute_flight with the same never-wedge-clients guarantee as the
        dispatcher's own try/except (needed when running on a worker thread,
        whose exceptions would otherwise vanish)."""
        try:
            self._execute_flight(flight)
        except Exception as e:
            with self._lock:
                self._stats["errors"] += 1
            for r in flight:
                if not r.future.done():
                    r.future.set_exception(e)

    def _execute_flight(self, flight) -> None:
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
            sampler_kwargs=self.cfg.sampler_kwargs,
        )
        wall = time.monotonic() - t0
        t_done = time.monotonic()
        for r, out in zip(flight, outs):
            if not r.future.done():  # may have been failed by a flight timeout
                r.future.set_result(np.asarray(out, dtype=np.float32))
        with self._lock:
            self._stats["requests"] += len(flight)
            self._stats["flights"] += 1
            self._stats["audio_seconds"] += sum(
                r.y.shape[-1] for r in flight) / 16000.0
            self._stats["wall_seconds"] += wall
            # end-to-end latency incl. queue wait + linger + device time
            self._latencies.extend(t_done - r.t_submit for r in flight)

    def _run(self) -> None:
        try:
            self._run_loop()
        finally:
            if not self._closed:
                # The dispatcher died (a bug escaped the per-flight guard, or
                # a BaseException like MemoryError). A wedged client is the
                # worst outcome: mark the service dead — submit() rejects
                # from now on — and fail everything still queued.
                self._dead = True
                err = RuntimeError(
                    "service dispatcher died; service is unusable")
                while True:
                    try:
                        item = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if item is not _CLOSE and not item.future.done():
                        item.future.set_exception(err)

    def _run_loop(self) -> None:
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
