"""upfirdn2d: fused upsample -> FIR filter -> downsample.

TPU-native equivalent of the reference's custom CUDA op
(sgmse/backbones/ncsnpp_utils/op/upfirdn2d_kernel.cu, exact CPU semantics at
op/upfirdn2d.py:159-200): zero-stuff by ``up``, pad, 2-D convolve with the FIR
kernel, then decimate by ``down``.

On TPU the whole op is ONE ``lax.conv_general_dilated`` call:

  - zero-stuffing  -> ``lhs_dilation=(up, up)`` (the trailing ``up-1`` zeros
    the reference emits per sample contribute nothing to the convolution, so
    they fold into the right-hand padding),
  - padding        -> conv padding (negative values supported by XLA),
  - true convolution -> correlation with the spatially flipped kernel,
  - decimation     -> ``window_strides=(down, down)``,
  - per-channel    -> ``feature_group_count=C`` (depthwise).

XLA lowers this straight onto the TPU convolution units; gradients come for
free through conv transposition (the reference hand-writes a double-backward
autograd Function, op/upfirdn2d.py:19-142).

Layout is NHWC (TPU-preferred). A numpy reference implementation is provided
for parity tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Apply upfirdn to a batch of 2D feature maps.

    Args:
        x: ``[N, H, W, C]`` input.
        kernel: ``[kh, kw]`` FIR kernel.
        up / down: integer resampling factors.
        pad: ``(pad0, pad1)`` applied to both spatial dims (may be negative).

    Returns:
        ``[N, H', W', C]`` with ``H' = (H*up + pad0 + pad1 - kh) // down + 1``.
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    # True convolution == correlation with the flipped kernel.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 (depthwise)

    out = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def upfirdn2d_numpy(
    x: np.ndarray, kernel: np.ndarray, up: int = 1, down: int = 1, pad=(0, 0)
) -> np.ndarray:
    """Reference numpy implementation (NCHW, matching the documented CUDA-op
    semantics: zero-stuff, pad, convolve, decimate). Used for parity tests."""
    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    # zero-stuff: each sample followed by (up-1) zeros
    out = np.zeros((n, c, in_h * up, in_w * up), dtype=x.dtype)
    out[:, :, ::up, ::up] = x

    # pad (negative = crop)
    total_h = in_h * up + pad0 + pad1
    total_w = in_w * up + pad0 + pad1
    padded = np.zeros((n, c, max(total_h, 0), max(total_w, 0)), dtype=x.dtype)
    src = out[
        :,
        :,
        max(-pad0, 0) : out.shape[2] - max(-pad1, 0),
        max(-pad0, 0) : out.shape[3] - max(-pad1, 0),
    ]
    padded[
        :,
        :,
        max(pad0, 0) : max(pad0, 0) + src.shape[2],
        max(pad0, 0) : max(pad0, 0) + src.shape[3],
    ] = src

    # true 2-D convolution with the kernel
    out_h = (total_h - kh) // down + 1
    out_w = (total_w - kw) // down + 1
    kernel_flipped = kernel[::-1, ::-1]
    result = np.zeros((n, c, out_h, out_w), dtype=np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = padded[:, :, i : i + (out_h - 1) * down + 1 : down,
                           j : j + (out_w - 1) * down + 1 : down]
            result += patch * kernel_flipped[i, j]
    return result
