"""Spectrogram magnitude-compression transforms and padding helpers.

Pure-function equivalents of the reference's data-module transforms
(sgmse/data_module.py:241-267) and the eval-time time-axis padders
(sgmse/util/other.py:83-99). ``spec_fwd``/``spec_back`` are exact inverses of
one another for all three transform types; they run on-device inside jitted
programs (the SNR-aligned sebridge_v3 bridge applies them inside the train
step, reference: sgmse/model.py:293-326, 361-390).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecTransformConfig:
    """Transform parameters (defaults: sgmse/data_module.py:190-193)."""

    transform_type: str = "exponent"  # "exponent" | "log" | "none"
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5


def _polar(mag: jnp.ndarray, spec: jnp.ndarray) -> jnp.ndarray:
    """Rebuild a complex array from a new magnitude and the phase of `spec`.

    Uses mag * spec/|spec| instead of exp(1j*angle) to avoid the atan2+sincos
    round-trip; both are mathematically identical and the 0/0 case is guarded.
    """
    abs_spec = jnp.abs(spec)
    safe = jnp.where(abs_spec == 0, 1.0, abs_spec)
    return (mag / safe) * spec


def spec_fwd(spec: jnp.ndarray, cfg: SpecTransformConfig = SpecTransformConfig()) -> jnp.ndarray:
    """Forward (compression) transform: |c|^e * exp(i angle(c)) * factor."""
    if cfg.transform_type == "exponent":
        if cfg.spec_abs_exponent != 1:
            e = cfg.spec_abs_exponent
            spec = _polar(jnp.abs(spec) ** e, spec)
        spec = spec * cfg.spec_factor
    elif cfg.transform_type == "log":
        spec = _polar(jnp.log1p(jnp.abs(spec)), spec)
        spec = spec * cfg.spec_factor
    elif cfg.transform_type == "none":
        pass
    else:
        raise ValueError(f"Unknown transform_type {cfg.transform_type}")
    return spec


def spec_back(spec: jnp.ndarray, cfg: SpecTransformConfig = SpecTransformConfig()) -> jnp.ndarray:
    """Inverse (expansion) transform of :func:`spec_fwd`."""
    if cfg.transform_type == "exponent":
        spec = spec / cfg.spec_factor
        if cfg.spec_abs_exponent != 1:
            e = cfg.spec_abs_exponent
            spec = _polar(jnp.abs(spec) ** (1 / e), spec)
    elif cfg.transform_type == "log":
        spec = spec / cfg.spec_factor
        spec = _polar(jnp.expm1(jnp.abs(spec)), spec)
    elif cfg.transform_type == "none":
        pass
    else:
        raise ValueError(f"Unknown transform_type {cfg.transform_type}")
    return spec


def _pad_time_axis(y: jnp.ndarray, multiple: int) -> jnp.ndarray:
    t = y.shape[-1]
    num_pad = (multiple - t % multiple) % multiple
    if num_pad == 0:
        return y
    pad_width = [(0, 0)] * (y.ndim - 1) + [(0, num_pad)]
    return jnp.pad(y, pad_width)


def pad_spec(y: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the time (last) axis to a multiple of 64.

    The NCSN++ U-Net downsamples six times, so eval-time widths must divide by
    64 (reference: sgmse/util/other.py:83-90, applied at sgmse/model.py:751).
    """
    return _pad_time_axis(y, 64)


def pad_spec_16(y: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the time (last) axis to a multiple of 16 (SNRNet input contract,
    reference: sgmse/util/other.py:92-99)."""
    return _pad_time_axis(y, 16)


def width_bucket(t_orig: int, hop_length: int):
    """Static width bucket for an utterance of ``t_orig`` samples: frames
    padded up to a multiple of 64 and the bucket's exact sample count.
    Returns ``(t_pad_frames, pad_samples)``. THE one definition of the
    enhance/artifact host pad contract (used by ScoreModel.enhance and
    serving/export.py; reference padding: sgmse/utils.py:79-86). Note
    ``pad_samples`` can be up to hop-1 SHORTER than ``t_orig`` when
    frames %% 64 == 0 — callers truncate the input and zero-pad the output
    tail (the reference's istft(length=T) does the same)."""
    frames = 1 + t_orig // hop_length
    t_pad = frames + (64 - frames % 64) % 64
    return t_pad, (t_pad - 1) * hop_length
