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


class MatmulConv(nn.Module):
    """Stride-1 SAME conv that lowers to ONE im2col matmul when the spatial
    map is small (``H*W <= max_hw``), falling back to the normal XLA conv
    otherwise.

    Param-compatible with ``nn.Conv`` (same ``kernel``/``bias`` names and
    HWIO kernel shape), so checkpoints and the torch converter are unaffected
    by the flag. Rationale: at the deep U-Net levels the feature maps shrink
    to a few rows (e.g. 4x1 spatial at T=64) where the TPU conv emitter's
    tiling is dominated by padding; an explicit ``[B*H*W, k*k*C] @
    [k*k*C, O]`` matmul presents the whole level as one well-shaped MXU op.
    """

    features: int
    kernel_size: int = 3
    init_scale: float = 1.0
    dtype: Optional[Any] = None
    max_hw: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ksz = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", default_init(self.init_scale),
            (ksz, ksz, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        k = kernel.astype(x.dtype)
        b, h, w, c = x.shape
        if ksz == 1 or h * w > self.max_hw:
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            p = ksz // 2
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            patches = jnp.concatenate(
                [xp[:, dh:dh + h, dw:dw + w, :]
                 for dh in range(ksz) for dw in range(ksz)], axis=-1,
            ).reshape(b * h * w, ksz * ksz * c)
            y = (patches @ k.reshape(ksz * ksz * c, self.features)).reshape(
                b, h, w, self.features)
        return y + bias.astype(y.dtype)


def conv1x1(features: int, init_scale: float = 1.0, name: Optional[str] = None,
            dtype=None) -> nn.Conv:
    return ddpm_conv(features, 1, init_scale=init_scale, name=name, dtype=dtype)


def conv3x3(features: int, init_scale: float = 1.0, name: Optional[str] = None,
            dtype=None, matmul_max_hw: int = 0):
    if matmul_max_hw:
        return MatmulConv(features, 3, init_scale=init_scale, dtype=dtype,
                          max_hw=matmul_max_hw, name=name)
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


class _GNParams(nn.Module):
    """Declares GroupNorm-compatible affine params (same names/shapes as
    ``nn.GroupNorm``) without running the op — the fused Pallas path computes
    the normalization itself but must keep the param tree identical so
    checkpoints and the torch converter are unaffected."""

    channels: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.channels,)),
            self.param("bias", nn.initializers.zeros, (self.channels,)),
        )


class _ConvParams(nn.Module):
    """Declares nn.Conv-compatible params (kernel HWIO + bias) with the DDPM
    initialization, for convs executed inside a fused Pallas kernel."""

    kernel_size: int
    in_ch: int
    features: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", default_init(self.init_scale),
            (self.kernel_size, self.kernel_size, self.in_ch, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


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


def _conv_nhwc(x, w, dtype, strides=(1, 1), matmul_max_hw=0):
    if dtype is not None:
        x = x.astype(dtype)
    w = w.astype(x.dtype)
    b, h, wd, c = x.shape
    ksz = w.shape[0]
    if (matmul_max_hw and h * wd <= matmul_max_hw and ksz > 1
            and strides == (1, 1)):
        p = ksz // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        patches = jnp.concatenate(
            [xp[:, dh:dh + h, dw:dw + wd, :]
             for dh in range(ksz) for dw in range(ksz)], axis=-1,
        ).reshape(b * h * wd, ksz * ksz * c)
        return (patches @ w.reshape(ksz * ksz * c, w.shape[-1])).reshape(
            b, h, wd, w.shape[-1])
    return jax.lax.conv_general_dilated(
        x, w, strides, "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style residual block with in-block FIR up/down-sampling
    (layerspp.py:214-276); optional `semb` realizes the `_snr` variant
    (layerspp.py:333-400).

    The optional ``x2`` input is the TPU-native replacement for the
    reference's explicit skip concatenation (ncsnpp.py:340): the block
    treats its input as the virtual concat ``[x, x2]`` but never
    materializes it. GroupNorm statistics are assembled from per-channel
    partial sums of the two halves (exact even when a group crosses the
    boundary), and a convolution is linear in its input channels, so
    normalizing each half with per-channel affine vectors and summing two
    convs with the split kernel is exact — it just removes a full
    feature-map write + read from every up-path block (the HBM bottleneck
    at serving time)."""

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
    # Enable the fused Pallas chain only when the block's input feature map
    # has at most this many spatial positions (0 = never). Targets the deep
    # U-Net levels (4x1 / 8x2 at T=64) where XLA's conv-emitter schedule is
    # weakest and custom-call relayout copies are cheapest; independent of
    # `pallas_gn_silu` (which enables it everywhere).
    pallas_max_hw: int = 0
    # Lower stride-1 3x3 convs to a single im2col matmul when the spatial
    # map has at most this many positions (0 = never; see MatmulConv).
    matmul_conv_max_hw: int = 0

    def _gn_act(self, h, channels, name, pallas_on=False):
        if pallas_on:
            out = FusedGroupNormSiLU(channels, name=name)(h)
            return out if self.dtype is None else out.astype(self.dtype)
        return self.act(group_norm(channels, name=name, dtype=self.dtype)(
            h if self.dtype is not None else h.astype(jnp.float32)))

    @nn.compact
    def __call__(self, x, temb=None, semb=None, train: bool = False,
                 x2=None):
        in_ch = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        out_ch = self.out_ch if self.out_ch else in_ch
        pallas_on = self.pallas_gn_silu or (
            self.pallas_max_hw > 0
            and x.shape[1] * x.shape[2] <= self.pallas_max_hw
        )
        num_groups0 = min(in_ch // 4, 32)
        cg0 = in_ch // num_groups0
        split_ok = (
            x2 is not None
            and not self.up
            and not self.down
            and not pallas_on
            and in_ch % num_groups0 == 0
        )
        if x2 is not None and not split_ok:
            x = jnp.concatenate([x, x2], axis=-1)
            x2 = None
        # With a half-precision compute dtype the WHOLE block stays in that
        # dtype (GroupNorm included — its statistics are still f32 inside
        # flax): bouncing to f32 around every norm doubles the HBM traffic
        # of the trunk, which is the inference bottleneck on TPU.
        if self.dtype is not None:
            x = x.astype(self.dtype)
            if x2 is not None:
                x2 = x2.astype(self.dtype)

        if x2 is not None:
            return self._call_split(x, x2, temb, semb, train, in_ch, out_ch,
                                    num_groups0, cg0)

        # Fully-fused Pallas path: each GroupNorm+SiLU+conv3x3 chain (plus
        # the conditioning bias and the residual combine) runs as ONE kernel
        # — 2 HBM reads + 1 write per chain instead of XLA's 3+2. Only for
        # non-resampling blocks (the FIR resample sits between norm and conv)
        # and when dropout is inactive; the op itself falls back to the
        # equivalent jnp chain for shapes outside the kernel's tiling rules.
        fused_ok = (
            pallas_on
            and not self.up
            and not self.down
            and (self.dropout == 0.0 or not train)
        )
        if fused_ok:
            from ..ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

            gs0, gb0 = _GNParams(in_ch, name="GroupNorm_0")()
            w0, b0 = _ConvParams(3, in_ch, out_ch, name="Conv_0")()
            bias0 = jnp.broadcast_to(
                b0.astype(jnp.float32)[None, :], (x.shape[0], out_ch)
            )
            if temb is not None:
                bias0 = bias0 + nn.Dense(
                    out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="Dense_0")(self.act(temb)).astype(jnp.float32)
            if semb is not None:
                bias0 = bias0 + nn.Dense(
                    out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="Dense_1")(self.act(semb)).astype(jnp.float32)
            h = groupnorm_silu_conv3x3_pallas(
                x, gs0, gb0, w0, bias0,
                num_groups=min(in_ch // 4, 32), compute_dtype=self.dtype,
            )

            gs1, gb1 = _GNParams(out_ch, name="GroupNorm_1")()
            w1, b1 = _ConvParams(3, out_ch, out_ch,
                                 init_scale=self.init_scale, name="Conv_1")()
            if in_ch != out_ch:
                x = conv1x1(out_ch, name="Conv_2", dtype=self.dtype)(x)
            bias1 = jnp.broadcast_to(
                b1.astype(jnp.float32)[None, :], (x.shape[0], out_ch)
            )
            out = groupnorm_silu_conv3x3_pallas(
                h, gs1, gb1, w1, bias1,
                num_groups=min(out_ch // 4, 32), compute_dtype=self.dtype,
                skip=x,
                skip_coef=(1.0 / math.sqrt(2.0)) if self.skip_rescale else 1.0,
            )
            return out if self.dtype is not None else out.astype(jnp.float32)

        h = self._gn_act(x, in_ch, "GroupNorm_0", pallas_on)

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

        h = conv3x3(out_ch, name="Conv_0", dtype=self.dtype,
                    matmul_max_hw=self.matmul_conv_max_hw)(h)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          name="Dense_0")(self.act(temb))[:, None, None, :]
        if semb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          name="Dense_1")(self.act(semb))[:, None, None, :]
        h = self._gn_act(h, out_ch, "GroupNorm_1", pallas_on)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                    dtype=self.dtype,
                    matmul_max_hw=self.matmul_conv_max_hw)(h)

        if in_ch != out_ch or self.up or self.down:
            x = conv1x1(out_ch, name="Conv_2", dtype=self.dtype)(x)

        if self.dtype is None:
            h = h.astype(jnp.float32)
            x = x.astype(jnp.float32)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)

    def _call_split(self, x, x2, temb, semb, train, in_ch, out_ch,
                    num_groups, cg):
        """Virtual-concat path: the block input is logically
        ``concatenate([x, x2], -1)`` but is processed as two halves — exact
        (partial-sum GroupNorm statistics + conv linearity), with the concat
        buffer never written to HBM. Parameter names/shapes are identical to
        the concat path, so checkpoints and the torch converter see one
        tree."""
        c1 = x.shape[-1]
        eps = 1e-6

        gs0, gb0 = _GNParams(in_ch, name="GroupNorm_0")()

        # GroupNorm statistics over the virtual concat from per-channel
        # partial sums (one cheap read per half; groups may cross the
        # boundary). Fast-variance form matches flax nn.GroupNorm.
        bsz, hh, ww, _ = x.shape
        n = hh * ww * cg

        def channel_sums(v):
            vf = v.astype(jnp.float32)
            return jnp.sum(vf, axis=(1, 2)), jnp.sum(vf * vf, axis=(1, 2))

        s1, q1 = channel_sums(x)
        s2, q2 = channel_sums(x2)
        ssum = jnp.concatenate([s1, s2], axis=-1)  # [B, C]
        ssq = jnp.concatenate([q1, q2], axis=-1)
        gsum = jnp.sum(ssum.reshape(bsz, num_groups, cg), axis=-1)
        gsq = jnp.sum(ssq.reshape(bsz, num_groups, cg), axis=-1)
        mean_g = gsum / n
        var_g = gsq / n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.repeat(mean_g, cg, axis=-1)  # [B, C]
        rstd_c = jnp.repeat(rstd_g, cg, axis=-1)
        a_c = rstd_c * gs0.astype(jnp.float32)[None, :]
        b_c = gb0.astype(jnp.float32)[None, :] - mean_c * a_c

        def norm_act(v, a, b):
            y = v.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
            if self.dtype is not None:
                y = y.astype(self.dtype)
            return self.act(y)

        h1 = norm_act(x, a_c[:, :c1], b_c[:, :c1])
        h2 = norm_act(x2, a_c[:, c1:], b_c[:, c1:])

        w0, b0 = _ConvParams(3, in_ch, out_ch, name="Conv_0")()
        h = (_conv_nhwc(h1, w0[:, :, :c1, :], self.dtype,
                        matmul_max_hw=self.matmul_conv_max_hw)
             + _conv_nhwc(h2, w0[:, :, c1:, :], self.dtype,
                          matmul_max_hw=self.matmul_conv_max_hw))
        h = h + b0.astype(h.dtype)
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
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                    dtype=self.dtype,
                    matmul_max_hw=self.matmul_conv_max_hw)(h)

        if in_ch != out_ch:
            w2, b2 = _ConvParams(1, in_ch, out_ch, name="Conv_2")()
            xr = (_conv_nhwc(x, w2[:, :, :c1, :], self.dtype)
                  + _conv_nhwc(x2, w2[:, :, c1:, :], self.dtype))
            xr = xr + b2.astype(xr.dtype)
        else:
            xr = jnp.concatenate([x, x2], axis=-1)

        if self.dtype is None:
            h = h.astype(jnp.float32)
            xr = xr.astype(jnp.float32)
        if not self.skip_rescale:
            return xr + h
        return (xr + h) / math.sqrt(2.0)


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
