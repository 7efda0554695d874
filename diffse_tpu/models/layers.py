"""NCSN++ layer library as flax.linen modules (NHWC).

TPU-native re-design of sgmse/backbones/ncsnpp_utils/{layers,layerspp}.py:
DDPM variance-scaling initializers, NIN (1x1 channel mixing), dense spatial
self-attention, FIR-resampling up/down blocks, and BigGAN/DDPM residual blocks
(plus their dual-conditioning `_snr` variants, layerspp.py:281-400).

Layout notes: feature maps are [B, H(=freq), W(=time), C]; conv kernels HWIO.
The dense attention is two batched matmuls over HW tokens — MXU-friendly.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fir import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    upsample_conv_2d,
)


def get_act(name: str) -> Callable:
    """Activation dispatch (ncsnpp_utils/layers.py:29-41)."""
    if name == "elu":
        return jax.nn.elu
    elif name == "relu":
        return jax.nn.relu
    elif name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    elif name == "swish":
        return jax.nn.silu
    else:
        raise NotImplementedError("activation function does not exist!")


def default_init(scale: float = 1.0):
    """DDPM initializer: variance_scaling(scale, fan_avg, uniform)
    (ncsnpp_utils/layers.py:84-91); scale=0 is clamped to 1e-10 so final convs
    start near zero."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def ddpm_conv(features: int, kernel: int, init_scale: float = 1.0, stride: int = 1,
              padding="SAME", name: Optional[str] = None, dtype=None) -> nn.Conv:
    """Conv with DDPM initialization (ncsnpp_utils/layers.py:100-124).

    `dtype` is the computation dtype (bf16 runs the matmuls on the MXU in
    half precision; params stay float32)."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, init_scale: float = 1.0, name: Optional[str] = None,
            dtype=None) -> nn.Conv:
    return ddpm_conv(features, 1, init_scale=init_scale, name=name, dtype=dtype)


def conv3x3(features: int, init_scale: float = 1.0, name: Optional[str] = None,
            dtype=None) -> nn.Conv:
    return ddpm_conv(features, 3, init_scale=init_scale, name=name, dtype=dtype)


def group_norm(channels: int, name: Optional[str] = None,
               dtype=None) -> nn.GroupNorm:
    """GroupNorm(min(C//4, 32), eps=1e-6), the NCSN++ convention
    (layerspp.py:69, 175, 221).

    `dtype` is the output/compute dtype; flax computes the mean/variance
    statistics in float32 regardless, so bf16 here only halves the HBM
    traffic of the activations, not the statistical precision."""
    return nn.GroupNorm(num_groups=min(channels // 4, 32), epsilon=1e-6,
                        name=name, dtype=dtype)


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm + SiLU through the fused Pallas kernel
    (ops/pallas_kernels.py::groupnorm_silu_pallas) — one VMEM round trip
    instead of XLA's normalize/affine/activation chain.

    Param-compatible with ``nn.GroupNorm`` (scale/bias under the same module
    name), so checkpoints and the torch converter are unaffected by the flag.
    Falls back to an equivalent jnp path where Mosaic is unavailable."""

    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        from ..ops.pallas_kernels import groupnorm_silu_pallas

        # Input dtype is preserved (bf16 trunk -> bf16 HBM traffic); the
        # kernel computes statistics in f32 internally.
        return groupnorm_silu_pallas(
            x, scale, bias,
            num_groups=min(self.channels // 4, 32), eps=self.eps,
        )


class NIN(nn.Module):
    """Network-in-network 1x1 channel mixing via einsum
    (ncsnpp_utils/layers.py:546-555), NHWC."""

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        w = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        return jnp.einsum("bhwc,cu->bhwu", x, w) + b


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features for noise levels (layerspp.py:32-43).

    Unlike the shared-module variant, the output dim is 2*embedding_size."""

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("W", nn.initializers.normal(stddev=self.scale), (self.embedding_size,))
        w = jax.lax.stop_gradient(w)
        x_proj = x[:, None] * w[None, :] * 2 * np.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
    """Combine information from skip connections (layerspp.py:46-61)."""

    dim2: int  # channels of y (used only to size the 1x1 conv on x)
    method: str = "cat"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        h = conv1x1(self.dim2, name="Conv_0", dtype=self.dtype)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y.astype(h.dtype)], axis=-1)
        elif self.method == "sum":
            return (h + y).astype(h.dtype)
        else:
            raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
    """Dense spatial self-attention over HW tokens (layerspp.py:64-93).

    w[b,h,w,i,j] = softmax_{ij}( q[b,h,w,:] . k[b,i,j,:] / sqrt(C) );
    out = x + NIN(w @ v), optionally /sqrt(2). Expressed as two batched
    matmuls over HW x HW so XLA tiles it onto the MXU.
    """

    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = group_norm(c, name="GroupNorm_0")(x)
        q = NIN(c, name="NIN_0")(h)
        k = NIN(c, name="NIN_1")(h)
        v = NIN(c, name="NIN_2")(h)

        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        w = w * (int(c) ** (-0.5))
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", w, v, preferred_element_type=jnp.float32)
        h = h.reshape(b, hh, ww, c).astype(x.dtype)
        # NIN's f32 weights would promote the residual sum to f32; cast back
        # so a half-precision trunk stays half-precision through attention.
        h = NIN(c, init_scale=self.init_scale, name="NIN_3")(h).astype(x.dtype)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class FirConv2d(nn.Module):
    """Conv2d with fused FIR up/down-sampling, the StyleGAN2 layer
    (up_or_down_sampling.py:23-56). NHWC/HWIO."""

    features: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert not (self.up and self.down)
        assert self.kernel >= 1 and self.kernel % 2 == 1
        in_ch = x.shape[-1]
        w = self.param(
            "weight", default_init(), (self.kernel, self.kernel, in_ch, self.features)
        )
        if self.up:
            x = upsample_conv_2d(x, w, k=list(self.resample_kernel))
        elif self.down:
            x = conv_downsample_2d(x, w, k=list(self.resample_kernel))
        else:
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            x = x + b.reshape(1, 1, 1, -1)
        return x


class Upsample(nn.Module):
    """2x upsample, optionally FIR and/or with conv (layerspp.py:96-128)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        out_ch = self.out_ch if self.out_ch else c
        if not self.fir:
            # nearest-neighbor interpolate
            hh = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            if self.with_conv:
                hh = conv3x3(out_ch, name="Conv_0")(hh)
        else:
            if not self.with_conv:
                hh = upsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                hh = FirConv2d(out_ch, 3, up=True, resample_kernel=self.fir_kernel,
                               use_bias=True, name="Conv2d_0")(x)
        return hh


class Downsample(nn.Module):
    """2x downsample, optionally FIR and/or with conv (layerspp.py:131-165)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        out_ch = self.out_ch if self.out_ch else c
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = ddpm_conv(out_ch, 3, stride=2, padding="VALID", name="Conv_0")(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = downsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                x = FirConv2d(out_ch, 3, down=True, resample_kernel=self.fir_kernel,
                              use_bias=True, name="Conv2d_0")(x)
        return x


class ResnetBlockDDPMpp(nn.Module):
    """DDPM-style residual block (layerspp.py:168-211); the optional `semb`
    input realizes the `_snr` variant (layerspp.py:281-330)."""

    act: Callable
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x, temb=None, semb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch if self.out_ch else in_ch
        h = self.act(group_norm(in_ch, name="GroupNorm_0")(x))
        h = conv3x3(out_ch, name="Conv_0")(h)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros, name="Dense_0")(
                self.act(temb))[:, None, None, :]
        if semb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros, name="Dense_1")(
                self.act(semb))[:, None, None, :]
        h = self.act(group_norm(out_ch, name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style residual block with in-block FIR up/down-sampling
    (layerspp.py:214-276); optional `semb` realizes the `_snr` variant
    (layerspp.py:333-400)."""

    act: Callable
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Optional[Any] = None  # compute dtype for the whole block
    # Use the fused Pallas GroupNorm+SiLU kernel for the two norm+act pairs
    # (only valid when `act` is SiLU/swish; param tree is unchanged).
    pallas_gn_silu: bool = False

    def _gn_act(self, h, channels, name):
        if self.pallas_gn_silu:
            out = FusedGroupNormSiLU(channels, name=name)(h)
            return out if self.dtype is None else out.astype(self.dtype)
        return self.act(group_norm(channels, name=name, dtype=self.dtype)(
            h if self.dtype is not None else h.astype(jnp.float32)))

    @nn.compact
    def __call__(self, x, temb=None, semb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch if self.out_ch else in_ch
        # With a half-precision compute dtype the WHOLE block stays in that
        # dtype (GroupNorm included — its statistics are still f32 inside
        # flax): bouncing to f32 around every norm doubles the HBM traffic
        # of the trunk, which is the inference bottleneck on TPU.
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = self._gn_act(x, in_ch, "GroupNorm_0")

        if self.up:
            if self.fir:
                h = upsample_2d(h, list(self.fir_kernel), factor=2)
                x = upsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                h = naive_upsample_2d(h, factor=2)
                x = naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = downsample_2d(h, list(self.fir_kernel), factor=2)
                x = downsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                h = naive_downsample_2d(h, factor=2)
                x = naive_downsample_2d(x, factor=2)

        h = conv3x3(out_ch, name="Conv_0", dtype=self.dtype)(h)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          name="Dense_0")(self.act(temb))[:, None, None, :]
        if semb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          name="Dense_1")(self.act(semb))[:, None, None, :]
        h = self._gn_act(h, out_ch, "GroupNorm_1")
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1", dtype=self.dtype)(h)

        if in_ch != out_ch or self.up or self.down:
            x = conv1x1(out_ch, name="Conv_2", dtype=self.dtype)(x)

        if self.dtype is None:
            h = h.astype(jnp.float32)
            x = x.astype(jnp.float32)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           max_positions: int = 10000) -> jnp.ndarray:
    """Sinusoidal positional embedding (ncsnpp_utils/layers.py:515-529)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
