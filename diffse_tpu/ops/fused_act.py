"""Fused bias-add + LeakyReLU.

Op-surface parity with the reference's fused_bias_act CUDA kernel
(sgmse/backbones/ncsnpp_utils/op/fused_act.py:74-97: LeakyReLU(0.2) with a
sqrt(2) gain after a broadcast bias add). Not referenced by the live NCSN++
path but part of the public op surface.

On TPU, XLA fuses the jnp expression into neighboring ops automatically; a
Pallas kernel variant is provided in ``diffse_tpu/ops/pallas_kernels.py`` for
cases where explicit fusion/placement control is wanted.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def fused_bias_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    channel_axis: int = -1,
) -> jnp.ndarray:
    """out = leaky_relu(x + bias) * scale, bias broadcast on `channel_axis`."""
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape)
    return jnp.where(x >= 0, x, negative_slope * x) * scale
