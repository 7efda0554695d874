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

TPU-first design note: the per-frame 510-point DFT is expressed as a MATMUL
against precomputed DFT bases (method="matmul", the default) — a [*, 510] x
[510, 256] product that maps straight onto the MXU. For a short, fixed,
non-power-of-two n_fft this is both faster than a generic FFT lowering and
independent of FFT-op backend support; ``method="fft"`` keeps the
``jnp.fft``-based path (both are tested equal against torch golden values).

Everything here is shape-static and jit-friendly; the whole pipeline
(STFT -> network -> iSTFT) runs on-device inside one XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(window_length: int, dtype=jnp.float32) -> np.ndarray:
    """Periodic Hann window, equal to ``torch.hann_window(L, periodic=True)``.

    Returned as a HOST numpy array: windows are jit constants, and building
    them must not touch a device (a broken ambient TPU client would raise on
    the eager transfer — see __graft_entry__'s hardening contract).
    """
    n = np.arange(window_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length)
    return np.asarray(w, dtype=dtype)


def sqrthann_window(window_length: int, dtype=jnp.float32) -> np.ndarray:
    """Square-root periodic Hann window (reference: sgmse/data_module.py:13-19)."""
    return np.sqrt(hann_window(window_length, dtype=dtype))


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


@lru_cache(maxsize=8)
def _dft_basis(n_fft: int):
    """Forward one-sided DFT basis: X[k] = sum_n x[n] e^{-2 pi i n k / N}.

    Returns (cos, msin) of shape [n_fft, K] with K = n_fft//2 + 1 so that
    Re X = x @ cos, Im X = x @ msin. Computed in float64 then cast.
    """
    k_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(k_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    # cache numpy (not jnp) arrays: jnp constants created during a jit trace
    # would leak tracers through the lru_cache
    return (
        np.cos(ang).astype(np.float32),
        (-np.sin(ang)).astype(np.float32),
    )


@lru_cache(maxsize=8)
def _idft_basis(n_fft: int):
    """Inverse one-sided DFT basis: x = Re X @ C + Im X @ S, shape [K, n_fft].

    Hermitian weights: w_k = 2 except w_0 (and w_{N/2} for even N) = 1;
    x[n] = (1/N) sum_k w_k (Re X[k] cos(2 pi k n / N) - Im X[k] sin(...)).
    """
    k_bins = n_fft // 2 + 1
    k = np.arange(k_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((k_bins, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    c = (w * np.cos(ang)) / n_fft
    s = (-(w * np.sin(ang))) / n_fft
    return c.astype(np.float32), s.astype(np.float32)


def _stft_conv(sig: jnp.ndarray, window: jnp.ndarray, n_fft: int, hop_length: int):
    """STFT as ONE strided convolution: 2K filters of length n_fft, stride hop.

    The window multiply and the DFT fold into the conv kernels — the most
    TPU-native formulation (no gather; one conv op on the MXU). Trace-safe:
    the (possibly traced) window folds into the kernels as a jnp op.
    """
    k_bins = n_fft // 2 + 1
    cos, msin = _dft_basis(n_fft)  # numpy [n_fft, K]
    win = window.astype(jnp.float32)[:, None]
    kernel = jnp.concatenate(
        [jnp.asarray(cos) * win, jnp.asarray(msin) * win], axis=1
    )[:, None, :]  # [n_fft, 1, 2K] (WIO)

    batch_shape = sig.shape[:-1]
    x = sig.reshape((-1, sig.shape[-1], 1))  # [B', L, 1] NWC
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(hop_length,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B', T, 2K]
    spec = jax.lax.complex(out[..., :k_bins], out[..., k_bins:])
    spec = jnp.swapaxes(spec, -1, -2)  # [B', K, T]
    return spec.reshape(batch_shape + spec.shape[1:])


def _istft_conv(spec: jnp.ndarray, window: jnp.ndarray, n_fft: int, hop_length: int):
    """iSTFT as ONE transposed convolution (zero-stuffed conv): the inverse
    DFT, synthesis window, and overlap-add fold into a [n_fft, 2K, 1] kernel;
    the squared-window OLA envelope is computed by the same conv structure
    (no scatter-add anywhere)."""
    k_bins = n_fft // 2 + 1
    c, s = _idft_basis(n_fft)  # numpy [K, n_fft]
    win = window.astype(jnp.float32)[None, :]
    kernel = jnp.concatenate([jnp.asarray(c) * win, jnp.asarray(s) * win], axis=0)
    # conv_transpose == correlate the zero-stuffed input with the spatially
    # flipped kernel (see diffse_tpu/ops/convt.py).
    kernel = jnp.flip(kernel.T, 0)[:, :, None]  # [n_fft, 2K, 1] (WIO)

    batch_shape = spec.shape[:-2]
    num_frames = spec.shape[-1]
    sp = spec.reshape((-1,) + spec.shape[-2:])  # [B', K, T]
    frames_ch = jnp.concatenate([sp.real, sp.imag], axis=-2)  # [B', 2K, T]
    frames_ch = jnp.swapaxes(frames_ch, -1, -2)  # [B', T, 2K] NWC

    def ola(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1,),
            padding=((n_fft - 1, n_fft - 1),), lhs_dilation=(hop_length,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        )

    out = ola(frames_ch, kernel)[..., 0]  # [B', total]

    # envelope: OLA of window^2 via the same transposed conv on all-ones frames
    env_kernel = jnp.flip(window.astype(jnp.float32) ** 2, 0)[:, None, None]
    env = ola(jnp.ones((1, num_frames, 1), jnp.float32), env_kernel)[0, :, 0]
    env = jnp.where(env > 1e-11, env, 1.0)
    out = out / env
    return out.reshape(batch_shape + out.shape[-1:])


def _rdft_frames(frames: jnp.ndarray, n_fft: int, method: str) -> jnp.ndarray:
    """[..., n_fft] real -> [..., n_fft//2+1] complex."""
    if method == "fft":
        return jnp.fft.rfft(frames, axis=-1)
    cos, msin = _dft_basis(n_fft)
    re = jnp.matmul(frames, cos, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, msin, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.complex(re, im)


def _irdft_frames(spec: jnp.ndarray, n_fft: int, method: str) -> jnp.ndarray:
    """[..., n_fft//2+1] complex -> [..., n_fft] real."""
    if method == "fft":
        return jnp.fft.irfft(spec, n=n_fft, axis=-1)
    c, s = _idft_basis(n_fft)
    return jnp.matmul(spec.real, c, precision=jax.lax.Precision.HIGHEST) + jnp.matmul(
        spec.imag, s, precision=jax.lax.Precision.HIGHEST
    )


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "method"))
def stft(
    sig: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int = 510,
    hop_length: int = 128,
    center: bool = True,
    method: str = "matmul",
) -> jnp.ndarray:
    """Short-time Fourier transform matching ``torch.stft`` semantics.

    Args:
        sig: real signal ``[..., T]``.
        window: analysis window ``[n_fft]``.
        n_fft: FFT size (also the window length).
        hop_length: frame hop.
        center: if True, reflect-pad by ``n_fft // 2`` on both sides.
        method: "matmul" (MXU DFT, default) or "fft".

    Returns:
        Complex spectrogram ``[..., n_fft // 2 + 1, num_frames]``.
    """
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (sig.ndim - 1) + [(pad, pad)]
        sig = jnp.pad(sig, pad_width, mode="reflect")
    if method == "conv":
        return _stft_conv(sig, window, n_fft, hop_length).astype(jnp.complex64)
    length = sig.shape[-1]
    num_frames = 1 + (length - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    frames = sig[..., idx]  # [..., num_frames, n_fft]
    frames = frames * window
    spec = _rdft_frames(frames, n_fft, method)  # [..., num_frames, n_fft//2+1]
    return jnp.swapaxes(spec, -1, -2).astype(jnp.complex64)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length", "method"))
def istft(
    spec: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int = 510,
    hop_length: int = 128,
    center: bool = True,
    length: int | None = None,
    method: str = "matmul",
) -> jnp.ndarray:
    """Inverse STFT matching ``torch.istft`` semantics.

    Args:
        spec: complex spectrogram ``[..., n_fft // 2 + 1, num_frames]``.
        window: synthesis window ``[n_fft]`` (same as analysis window).
        length: target output length (trim or zero-pad); ``None`` keeps the
            natural length ``hop * (num_frames - 1)`` when ``center=True``.
        method: "matmul" (MXU inverse DFT, default) or "fft".

    Returns:
        Real signal ``[..., length]``.
    """
    if method == "conv":
        num_frames = spec.shape[-1]
        total = n_fft + hop_length * (num_frames - 1)
        out = _istft_conv(spec, window, n_fft, hop_length)
    else:
        spec = jnp.swapaxes(spec, -1, -2)  # [..., num_frames, F]
        frames = _irdft_frames(spec, n_fft, method)  # [..., num_frames, n_fft]
        frames = frames * window

        num_frames = frames.shape[-2]
        total = n_fft + hop_length * (num_frames - 1)
        idx = _frame_indices(num_frames, n_fft, hop_length)  # [num_frames, n_fft]

        batch_shape = frames.shape[:-2]
        out = jnp.zeros(batch_shape + (total,), dtype=frames.dtype)
        out = out.at[..., idx].add(frames)

        env = jnp.zeros((total,), dtype=frames.dtype)
        env = env.at[idx].add(jnp.broadcast_to(window**2, idx.shape))
        # torch.istft errors out on (near-)zero envelope bins; after the center
        # trim the hann/hop=128 envelope is strictly positive, so clamping is a
        # no-op on the retained region and merely keeps the division
        # well-defined elsewhere.
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
