"""StyleGAN2-style FIR up/down-sampling built on upfirdn2d.

Functional twins of sgmse/backbones/ncsnpp_utils/up_or_down_sampling.py:59-257,
re-expressed in NHWC with HWIO conv weights (TPU-native layouts). The fused
"conv_transpose then FIR" / "FIR then strided conv" paths each lower to two
XLA convolutions that the TPU backend pipelines through the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .upfirdn2d import upfirdn2d


def setup_fir_kernel(k) -> np.ndarray:
    """Normalize a 1-D/2-D FIR kernel (up_or_down_sampling.py:181-188)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample, NHWC (up_or_down_sampling.py:59-63)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Box-mean downsample, NHWC (up_or_down_sampling.py:66-69)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))


def upsample_2d(x: jnp.ndarray, k=None, factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR upsample by `factor` (up_or_down_sampling.py:195-224)."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1] * factor
    k = setup_fir_kernel(k) * (gain * (factor**2))
    p = k.shape[0] - factor
    return upfirdn2d(
        x, jnp.asarray(k), up=factor, pad=((p + 1) // 2 + factor - 1, p // 2)
    )


def downsample_2d(x: jnp.ndarray, k=None, factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR downsample by `factor` (up_or_down_sampling.py:227-257)."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1] * factor
    k = setup_fir_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(
    x: jnp.ndarray, w: jnp.ndarray, k=None, factor: int = 2, gain: float = 1.0
) -> jnp.ndarray:
    """Fused 2x-upsample + 3x3 conv (up_or_down_sampling.py:72-141).

    Args:
        x: ``[N, H, W, Cin]``.
        w: conv weights ``[kh, kw, Cin, Cout]`` (HWIO).

    The reference's conv_transpose2d(stride=2, VALID) with its flip/permute
    dance reduces to a plain correlation with the original weights on the
    2x zero-stuffed input, which is exactly ``lhs_dilation=(2, 2)`` here.
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw, _cin, _cout = w.shape
    assert kh == kw

    if k is None:
        k = [1] * factor
    k = setup_fir_kernel(k) * (gain * (factor**2))
    p = (k.shape[0] - factor) - (kh - 1)

    h = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(
        h, jnp.asarray(k), pad=((p + 1) // 2 + factor - 1, p // 2 + 1)
    )


def conv_downsample_2d(
    x: jnp.ndarray, w: jnp.ndarray, k=None, factor: int = 2, gain: float = 1.0
) -> jnp.ndarray:
    """Fused FIR filter + stride-2 conv (up_or_down_sampling.py:144-178).

    Args:
        x: ``[N, H, W, Cin]``.
        w: conv weights ``[kh, kw, Cin, Cout]`` (HWIO).
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw, _cin, _cout = w.shape
    assert kh == kw

    if k is None:
        k = [1] * factor
    k = setup_fir_kernel(k) * gain
    p = (k.shape[0] - factor) + (kh - 1)
    x = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
