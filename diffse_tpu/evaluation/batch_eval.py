"""Bucketed batch enhancement for full test-set evaluation.

The reference enhances one utterance at a time (eval.py:119-132). For
production serving and full-VBD throughput, this driver groups utterances by
padded spectrogram width (multiples of 64 frames — the NCSN++ shape contract),
zero-pads each bucket's waveforms to a common length, and runs ONE jitted
batched enhancement per bucket fill. Per-file trims restore exact lengths.

Only a handful of distinct width buckets exist for VBD (1-10 s utterances),
so jit recompilation is bounded; each (branch, width, batch) program is
cached.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.score_model import ScoreModel
from .inference import _eval_fn


def width_bucket(num_samples: int, hop_length: int = 128, multiple: int = 64) -> int:
    """Padded frame count for an utterance of `num_samples` samples."""
    frames = 1 + num_samples // hop_length
    return frames + (multiple - frames % multiple) % multiple


def iter_buckets(
    wav_lengths: Sequence[int],
    batch_size: int,
    hop_length: int = 128,
) -> Iterator[Tuple[int, List[int]]]:
    """Group utterance indices into (bucket_frames, [indices]) batches."""
    buckets: Dict[int, List[int]] = defaultdict(list)
    for idx, n in enumerate(wav_lengths):
        buckets[width_bucket(n, hop_length)].append(idx)
    for t_pad in sorted(buckets):
        idxs = buckets[t_pad]
        for i in range(0, len(idxs), batch_size):
            yield t_pad, idxs[i : i + batch_size]


def batch_enhance(
    model: ScoreModel,
    variables,
    x_wavs: Sequence[np.ndarray],
    y_wavs: Sequence[np.ndarray],
    model_type: str,
    key: jax.Array,
    batch_size: int = 8,
    est_snrs: Optional[Sequence[float]] = None,
    fixed_snr: Optional[float] = None,
    mesh=None,
    sampler_kwargs: Optional[dict] = None,
) -> List[np.ndarray]:
    """Enhance a list of utterances with bucketed batching.

    Semantics are exactly per-utterance (`_eval_fn` normalizes per row and
    takes per-row SNR estimates), so batch_size only affects throughput.
    Zero-padded tails are trimmed per file. The only residual deviation from
    the one-at-a-time reference path is that shorter utterances within a
    bucket see extra zero samples before the STFT (silence), which the
    per-row max-abs normalizer ignores.
    """
    hop = model.cfg.hop_length
    lengths = [int(y.shape[-1]) for y in y_wavs]
    out: List[Optional[np.ndarray]] = [None] * len(y_wavs)

    # Multi-chip eval parallelism (SURVEY.md §2.3: per-utterance fan-out is a
    # pure sharding of the file list): shard the bucket batch over the mesh's
    # data axis; params stay replicated. batch_size should then be a multiple
    # of the device count.
    put = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sh = batch_sharding(mesh)
        put = lambda a: jax.device_put(a, sh)

    def prepare(t_pad, idxs):
        """Host side: pad/pack one bucket batch (wav I/O + numpy copies)."""
        pad_samples = (t_pad - 1) * hop
        xb = np.zeros((len(idxs), pad_samples), dtype=np.float32)
        yb = np.zeros((len(idxs), pad_samples), dtype=np.float32)
        for row, idx in enumerate(idxs):
            n = min(lengths[idx], pad_samples)
            xb[row, :n] = np.asarray(x_wavs[idx]).reshape(-1)[:n]
            yb[row, :n] = np.asarray(y_wavs[idx]).reshape(-1)[:n]
        if est_snrs is not None:
            est = np.asarray([est_snrs[i] for i in idxs], dtype=np.float32)
        else:
            est = np.ones((len(idxs),), dtype=np.float32)
        return xb, yb, est

    def fit_length(w: np.ndarray, n: int) -> np.ndarray:
        """Trim/zero-pad a row to exactly n samples (a frames%64==0 bucket
        yields up to hop-1 fewer samples than the original utterance)."""
        w = w[:n]
        return np.pad(w, (0, n - w.shape[-1])) if w.shape[-1] < n else w

    def dispatch(bi, t_pad, idxs, prepped):
        """Enqueue the device program asynchronously (JAX dispatch does not
        block); returns the in-flight device array."""
        xb, yb, est = prepped
        fn = _eval_fn(model, model_type, t_pad, fixed_snr=fixed_snr,
                      sampler_kwargs=sampler_kwargs)
        xj, yj, ej = jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(est)
        if put is not None and len(idxs) % len(mesh.devices.flat) == 0:
            xj, yj, ej = put(xj), put(yj), put(ej)
        return fn(variables, xj, yj, jax.random.fold_in(key, bi), ej)

    # Software pipeline: while the device enhances bucket k, the host packs
    # bucket k+1 (the reference serializes wav I/O with GPU compute,
    # eval.py:119-140; VERDICT r1 flagged the same serialization here).
    buckets = list(iter_buckets(lengths, batch_size, hop))
    pending: Optional[Tuple[List[int], object]] = None
    for bi, (t_pad, idxs) in enumerate(buckets):
        prepped = prepare(t_pad, idxs)
        inflight = dispatch(bi, t_pad, idxs, prepped)
        if pending is not None:
            p_idxs, p_arr = pending
            x_hat = np.asarray(p_arr)  # blocks on the PREVIOUS bucket only
            for row, idx in enumerate(p_idxs):
                out[idx] = fit_length(x_hat[row], lengths[idx])
        pending = (idxs, inflight)
    if pending is not None:
        p_idxs, p_arr = pending
        x_hat = np.asarray(p_arr)
        for row, idx in enumerate(p_idxs):
            out[idx] = fit_length(x_hat[row], lengths[idx])

    return out  # type: ignore[return-value]
