"""Overlap-chunked streaming enhancement.

Production-serving path: split an arbitrarily long utterance into fixed-width
chunks (default 64 frames = ~0.5 s, the bucket the NCSN++ shape contract
already requires), enhance every chunk in ONE batched jitted call, and
overlap-add the chunk waveforms with a linear cross-fade. This bounds the
compiled program set to a single width bucket regardless of utterance length
(the reference instead pads each utterance to a multiple of 64 frames and
recompiles per length bucket, sgmse/util/other.py:83-90).

Chunks see only local context, so results differ slightly from full-context
enhancement near chunk boundaries; the cross-fade keeps transitions smooth.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.score_model import ScoreModel
from .inference import _eval_fn


def _crossfade_weights(chunk_len: int, overlap: int, position: str) -> np.ndarray:
    """Linear cross-fade window for a chunk: ramp over the overlapped regions."""
    w = np.ones(chunk_len, dtype=np.float32)
    if overlap > 0:
        # half-sample-offset ramp: head ramp + the next chunk's tail ramp sum
        # to exactly 1 across the overlap
        ramp = ((np.arange(overlap) + 0.5) / overlap).astype(np.float32)
        if position not in ("first", "only"):
            w[:overlap] = ramp
        if position not in ("last", "only"):
            w[-overlap:] = ramp[::-1]
    return w


def enhance_streamed(
    model: ScoreModel,
    variables,
    y_wav: np.ndarray,
    model_type: str,
    key: jax.Array,
    chunk_frames: int = 64,
    overlap_frames: int = 16,
    x_wav: Optional[np.ndarray] = None,
    est_snr: float = 1.0,
    fixed_snr: Optional[float] = None,
    trim_frames: int = 0,
) -> np.ndarray:
    """Enhance one utterance of any length via overlapped fixed-width chunks.

    Args:
        y_wav: noisy waveform ``[T]``.
        model_type: an evaluate_model branch name (e.g. 'sebridge_v2',
            'sebridge_v3_snr', 'bbed').
        chunk_frames / overlap_frames: chunk geometry in STFT frames
            (chunk_frames must be a multiple of 64).
        x_wav: optional clean reference (only used by branches that need X).
        trim_frames: discard this many frames from each interior chunk edge
            before the overlap-add (they carry the least context and the
            iSTFT window taper); requires ``overlap_frames > 2*trim_frames``
            so trimmed chunks still overlap. Utterance edges are never
            trimmed.

    Returns:
        enhanced waveform ``[T]`` (numpy).
    """
    assert chunk_frames % 64 == 0, "chunk_frames must be a multiple of 64"
    assert 0 <= overlap_frames < chunk_frames
    assert trim_frames >= 0 and 2 * trim_frames < max(overlap_frames, 1) or \
        trim_frames == 0, "need overlap_frames > 2*trim_frames"
    hop = model.cfg.hop_length
    y_wav = np.asarray(y_wav).reshape(-1)
    x_wav = y_wav if x_wav is None else np.asarray(x_wav).reshape(-1)
    t_orig = y_wav.shape[-1]

    chunk_len = (chunk_frames - 1) * hop
    hop_len = (chunk_frames - overlap_frames - 1) * hop
    overlap_len = chunk_len - hop_len
    trim_len = trim_frames * hop

    # chunk start offsets covering the signal
    starts = list(range(0, max(t_orig - overlap_len, 1), hop_len))

    xb = np.zeros((len(starts), chunk_len), dtype=np.float32)
    yb = np.zeros((len(starts), chunk_len), dtype=np.float32)
    for i, s in enumerate(starts):
        seg = y_wav[s : s + chunk_len]
        xseg = x_wav[s : s + chunk_len]
        yb[i, : len(seg)] = seg
        xb[i, : len(xseg)] = xseg

    fn = _eval_fn(model, model_type, chunk_frames, fixed_snr=fixed_snr)
    est = jnp.full((len(starts),), est_snr, dtype=jnp.float32)
    out_chunks = np.asarray(
        fn(variables, jnp.asarray(xb), jnp.asarray(yb), key, est)
    )

    # overlap-add with linear cross-fades over the kept (untrimmed) regions
    total = starts[-1] + chunk_len
    acc = np.zeros(total, dtype=np.float64)
    wsum = np.zeros(total, dtype=np.float64)
    for i, s in enumerate(starts):
        if len(starts) == 1:
            # A lone chunk is both first AND last: no interior edges exist,
            # so nothing may be trimmed (else the utterance tail would land
            # in a wsum=0 region and be emitted as silence).
            pos = "only"
        elif i == 0:
            pos = "first"
        elif i == len(starts) - 1:
            pos = "last"
        else:
            pos = "mid"
        lo = trim_len if pos in ("mid", "last") else 0
        hi = chunk_len - (trim_len if pos in ("first", "mid") else 0)
        kept = hi - lo
        ov = overlap_len - 2 * trim_len if trim_len else overlap_len
        w = _crossfade_weights(kept, ov, pos)
        acc[s + lo : s + hi] += out_chunks[i][lo:hi] * w
        wsum[s + lo : s + hi] += w
    wsum = np.where(wsum > 1e-8, wsum, 1.0)
    out = (acc / wsum).astype(np.float32)
    return out[:t_orig]
