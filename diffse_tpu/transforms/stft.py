"""Bit-faithful STFT / iSTFT as pure JAX functions.

The reference pipeline operates on complex STFT spectrograms produced by
``torch.stft(sig, n_fft=510, hop_length=128, window=hann(510, periodic=True),
center=True)`` (reference: sgmse/data_module.py:269-297). For PESQ/SI-SDR
parity the analysis/synthesis here must match torch's semantics exactly:

  - ``center=True``: the signal is padded with ``n_fft // 2`` samples on both
    sides using *reflect* padding before framing.
  - ``win_length = n_fft`` (510), hann *periodic* window.
  - one-sided rFFT -> ``n_fft // 2 + 1`` = 256 frequency bins.
  - ``num_frames = 1 + L // hop`` for input length L (with center padding).
  - iSTFT: per-frame irfft, window multiply, overlap-add, division by the
    overlap-added squared-window envelope, center trim, then trim/pad to
    ``length``.

Everything here is shape-static and jit-friendly; the whole pipeline
(STFT -> network -> iSTFT) runs on-device inside one XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(window_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, equal to ``torch.hann_window(L, periodic=True)``."""
    n = np.arange(window_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length)
    return jnp.asarray(w, dtype=dtype)


def sqrthann_window(window_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Square-root periodic Hann window (reference: sgmse/data_module.py:13-19)."""
    return jnp.sqrt(hann_window(window_length, dtype=dtype))


def get_window(window_type: str, window_length: int, dtype=jnp.float32) -> jnp.ndarray:
    if window_type == "sqrthann":
        return sqrthann_window(window_length, dtype=dtype)
    elif window_type == "hann":
        return hann_window(window_length, dtype=dtype)
    else:
        raise NotImplementedError(f"Window type {window_type} not implemented!")


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """STFT parameters (defaults follow sgmse/data_module.py:184-187)."""

    n_fft: int = 510
    hop_length: int = 128
    window: str = "hann"
    center: bool = True

    @property
    def num_freq_bins(self) -> int:
        return self.n_fft // 2 + 1

    def window_array(self, dtype=jnp.float32) -> jnp.ndarray:
        return get_window(self.window, self.n_fft, dtype=dtype)


def _frame_indices(num_frames: int, n_fft: int, hop_length: int) -> jnp.ndarray:
    starts = np.arange(num_frames)[:, None] * hop_length
    offsets = np.arange(n_fft)[None, :]
    return jnp.asarray(starts + offsets)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft(
    sig: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int = 510,
    hop_length: int = 128,
    center: bool = True,
) -> jnp.ndarray:
    """Short-time Fourier transform matching ``torch.stft`` semantics.

    Args:
        sig: real signal ``[..., T]``.
        window: analysis window ``[n_fft]``.
        n_fft: FFT size (also the window length).
        hop_length: frame hop.
        center: if True, reflect-pad by ``n_fft // 2`` on both sides.

    Returns:
        Complex spectrogram ``[..., n_fft // 2 + 1, num_frames]``.
    """
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (sig.ndim - 1) + [(pad, pad)]
        sig = jnp.pad(sig, pad_width, mode="reflect")
    length = sig.shape[-1]
    num_frames = 1 + (length - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    frames = sig[..., idx]  # [..., num_frames, n_fft]
    frames = frames * window
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., num_frames, n_fft//2+1]
    return jnp.swapaxes(spec, -1, -2).astype(jnp.complex64)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length"))
def istft(
    spec: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int = 510,
    hop_length: int = 128,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT matching ``torch.istft`` semantics.

    Args:
        spec: complex spectrogram ``[..., n_fft // 2 + 1, num_frames]``.
        window: synthesis window ``[n_fft]`` (same as analysis window).
        length: target output length (trim or zero-pad); ``None`` keeps the
            natural length ``hop * (num_frames - 1)`` when ``center=True``.

    Returns:
        Real signal ``[..., length]``.
    """
    spec = jnp.swapaxes(spec, -1, -2)  # [..., num_frames, F]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [..., num_frames, n_fft]
    frames = frames * window

    num_frames = frames.shape[-2]
    total = n_fft + hop_length * (num_frames - 1)
    idx = _frame_indices(num_frames, n_fft, hop_length)  # [num_frames, n_fft]

    batch_shape = frames.shape[:-2]
    out = jnp.zeros(batch_shape + (total,), dtype=frames.dtype)
    out = out.at[..., idx].add(frames)

    env = jnp.zeros((total,), dtype=frames.dtype)
    env = env.at[idx].add(jnp.broadcast_to(window**2, idx.shape))
    # torch.istft errors out on (near-)zero envelope bins; after the center trim
    # the hann/hop=128 envelope is strictly positive, so clamping is a no-op on
    # the retained region and merely keeps the division well-defined elsewhere.
    env = jnp.where(env > 1e-11, env, 1.0)
    out = out / env

    if center:
        half = n_fft // 2
        out = out[..., half : total - half]

    if length is not None:
        cur = out.shape[-1]
        if cur >= length:
            out = out[..., :length]
        else:
            pad_width = [(0, 0)] * (out.ndim - 1) + [(0, length - cur)]
            out = jnp.pad(out, pad_width)
    return out
