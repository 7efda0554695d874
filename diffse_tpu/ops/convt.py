"""2-D transposed convolution with torch ConvTranspose2d semantics.

Needed by DCUNet's decoder blocks (sgmse/backbones/dcunet.py:429-449), which
rely on torch's ``output_size`` argument to pick the output_padding. Expressed
as a single ``lax.conv_general_dilated``: zero-stuff the input by the stride
(lhs_dilation) and correlate with the spatially flipped kernel under the
transposed-conv padding arithmetic

    out = (in - 1) * stride - 2 * padding + dilation * (k - 1) + 1 + output_padding
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    output_padding: tuple[int, int] = (0, 0),
    dilation: tuple[int, int] = (1, 1),
) -> jnp.ndarray:
    """Args:
        x: ``[B, H, W, Cin]``.
        w: ``[kh, kw, Cin, Cout]`` (HWIO).
        padding/output_padding/dilation: per-spatial-dim ints.

    Returns:
        ``[B, H', W', Cout]`` following the torch output-size formula.
    """
    kh, kw = w.shape[0], w.shape[1]
    sh, sw = stride
    ph, pw = padding
    oph, opw = output_padding
    dh, dw = dilation

    w_flipped = jnp.flip(w, (0, 1)).astype(x.dtype)
    pad_h = (dh * (kh - 1) - ph, dh * (kh - 1) - ph + oph)
    pad_w = (dw * (kw - 1) - pw, dw * (kw - 1) - pw + opw)
    return jax.lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
