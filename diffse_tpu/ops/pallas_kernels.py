"""Pallas TPU kernels for the framework's custom-op surface.

The reference ships two CUDA kernels (SURVEY.md §2.2): upfirdn2d and
fused_bias_act. On TPU, upfirdn2d lowers to a single XLA convolution
(diffse_tpu/ops/upfirdn2d.py) that the conv emitter already schedules
optimally onto the MXU, so no hand kernel is needed for it. The fused
bias+LeakyReLU elementwise op is provided here as a Pallas VPU kernel for
op-surface parity (op/fused_bias_act_kernel.cu) and as a building block for
later fusions; on CPU test platforms it runs in interpreter mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _groupnorm_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps,
                           apply_silu):
    """One batch row per grid step: x_ref [S, C] (flattened spatial x channels).

    GroupNorm statistics are computed per channel group over (spatial, C/G),
    then scale/shift and (optionally) SiLU are applied — one VMEM round trip
    instead of XLA's normalize/affine/activation chain.
    """
    x = x_ref[0]  # block is [1, S, C]
    s, c = x.shape
    cg = c // num_groups
    xg = x.reshape(s, num_groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(s, c)
    out = xn * scale_ref[...] + bias_ref[...]
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out


def groupnorm_silu_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
    apply_silu: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused GroupNorm(+SiLU) as a Pallas kernel, NHWC.

    The GroupNorm -> activation pair opens every NCSN++ residual block
    (models/layers.py); fusing it keeps the normalized activations in VMEM.
    One grid step per batch row: requires H*W*C*4 bytes <= ~VMEM; for the
    production shapes ([256, 64, 128] f32 = 8 MB) this fits a v5e core.

    Args:
        x: ``[B, H, W, C]``.
        scale, bias: ``[C]`` affine parameters.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    assert c % num_groups == 0
    x2 = x.reshape(b, h * w, c)

    kernel = functools.partial(
        _groupnorm_silu_kernel, num_groups=num_groups, eps=eps,
        apply_silu=apply_silu,
    )
    try:
        out = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((c,), lambda i: (0,)),
                pl.BlockSpec((c,), lambda i: (0,)),
            ],
            out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            interpret=interpret,
        )(x2, scale.astype(x2.dtype), bias.astype(x2.dtype))
        return out.reshape(b, h, w, c)
    except Exception:
        # Mosaic compilation unavailable (e.g. remote-compile bridges without
        # a Pallas helper, see DEVNOTES.md): jnp fallback, same math.
        return _groupnorm_silu_jnp(x, scale, bias, num_groups, eps, apply_silu)


def _groupnorm_silu_jnp(x, scale, bias, num_groups, eps, apply_silu):
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    out = xn * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out


def _fused_bias_lrelu_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[...]
    b = b_ref[...]
    v = x + b  # bias broadcasts along the trailing (channel) axis
    o_ref[...] = jnp.where(v >= 0, v, negative_slope * v) * scale


def fused_bias_leaky_relu_pallas(
    x: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused bias-add + LeakyReLU(0.2) * sqrt(2) as a Pallas kernel.

    Args:
        x: ``[..., C]`` (channels-last).
        bias: ``[C]``.
        interpret: force interpreter mode (auto-on for non-TPU backends).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    c = orig_shape[-1]
    x2 = x.reshape(-1, c)

    kernel = functools.partial(
        _fused_bias_lrelu_kernel, negative_slope=negative_slope, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=interpret,
    )(x2, bias.astype(x2.dtype))
    return out.reshape(orig_shape)
