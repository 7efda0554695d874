"""Legacy NCSNv1/v2 layer library (RefineNet-style blocks).

Flax twins of sgmse/backbones/ncsnpp_utils/layers.py:133-662 — CRP/RCU/MSF/
Refine blocks and the pre-"pp" AttnBlock / Upsample / Downsample /
ResnetBlockDDPM. These are not used by the live NCSN++ path (SURVEY.md
"Legacy layers") but are part of the score_sde backbone capability surface.

NHWC layouts throughout.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import NIN, default_init, group_norm


def ncsn_conv(features: int, kernel: int = 3, stride: int = 1, bias: bool = True,
              dilation: int = 1, init_scale: float = 1.0,
              name: Optional[str] = None) -> nn.Conv:
    """3x3/1x1 conv with NCSNv1/v2-style init-scale (layers.py:44-56, 110-117):
    default torch init scaled by init_scale (1e-10 when 0)."""
    init_scale = 1e-10 if init_scale == 0 else init_scale
    base = nn.initializers.lecun_normal()

    def scaled_init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * init_scale

    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding="SAME",
        kernel_dilation=(dilation, dilation), use_bias=bias,
        kernel_init=scaled_init, name=name,
    )


def _pool5(x: jnp.ndarray, maxpool: bool) -> jnp.ndarray:
    if maxpool:
        return nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
    return nn.avg_pool(x, (5, 5), strides=(1, 1), padding="SAME")


class CRPBlock(nn.Module):
    """Chained residual pooling (layers.py:133-155)."""

    features: int
    n_stages: int
    act: Callable = jax.nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, self.maxpool)
            path = ncsn_conv(self.features, bias=False, name=f"conv_{i}")(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """Conditional CRP (layers.py:157-180)."""

    features: int
    n_stages: int
    num_classes: int
    normalizer: Callable
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.normalizer(num_classes=self.num_classes, name=f"norm_{i}")(path, y)
            path = _pool5(path, maxpool=False)
            path = ncsn_conv(self.features, bias=False, name=f"conv_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (layers.py:183-204)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv(self.features, bias=False, name=f"{i+1}_{j+1}_conv")(x)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """Conditional RCU (layers.py:207-232)."""

    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    normalizer: Callable
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, y):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.normalizer(num_classes=self.num_classes,
                                    name=f"{i+1}_{j+1}_norm")(x, y)
                x = self.act(x)
                x = ncsn_conv(self.features, bias=False, name=f"{i+1}_{j+1}_conv")(x)
            x = x + residual
        return x


def _bilinear_resize(x: jnp.ndarray, shape) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, shape[0], shape[1], c), method="bilinear")


class MSFBlock(nn.Module):
    """Multi-scale fusion (layers.py:235-250)."""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape):
        sums = jnp.zeros((xs[0].shape[0], shape[0], shape[1], self.features),
                         dtype=xs[0].dtype)
        for i, xi in enumerate(xs):
            h = ncsn_conv(self.features, bias=True, name=f"conv_{i}")(xi)
            h = _bilinear_resize(h, shape)
            sums = sums + h
        return sums


class CondMSFBlock(nn.Module):
    """Conditional MSF (layers.py:253-273)."""

    features: int
    num_classes: int
    normalizer: Callable

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], y, shape):
        sums = jnp.zeros((xs[0].shape[0], shape[0], shape[1], self.features),
                         dtype=xs[0].dtype)
        for i, xi in enumerate(xs):
            h = self.normalizer(num_classes=self.num_classes, name=f"norm_{i}")(xi, y)
            h = ncsn_conv(self.features, bias=True, name=f"conv_{i}")(h)
            h = _bilinear_resize(h, shape)
            sums = sums + h
        return sums


class RefineBlock(nn.Module):
    """RefineNet block: RCU adapters -> MSF -> CRP -> output RCU
    (layers.py:276-310)."""

    features: int
    act: Callable = jax.nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], output_shape):
        hs = []
        for i, xi in enumerate(xs):
            hs.append(RCUBlock(xi.shape[-1], 2, 2, self.act, name=f"adapt_{i}")(xi))
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool, name="crp")(h)
        h = RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                     name="output_convs")(h)
        return h


class CondRefineBlock(nn.Module):
    """Conditional RefineNet block (layers.py:313-348)."""

    features: int
    num_classes: int
    normalizer: Callable
    act: Callable = jax.nn.relu
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], y, output_shape):
        hs = []
        for i, xi in enumerate(xs):
            hs.append(
                CondRCUBlock(xi.shape[-1], 2, 2, self.num_classes, self.normalizer,
                             self.act, name=f"adapt_{i}")(xi, y)
            )
        if len(xs) > 1:
            h = CondMSFBlock(self.features, self.num_classes, self.normalizer,
                             name="msf")(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.num_classes, self.normalizer,
                         self.act, name="crp")(h, y)
        h = CondRCUBlock(self.features, 3 if self.end else 1, 2, self.num_classes,
                         self.normalizer, self.act, name="output_convs")(h, y)
        return h


class ConvMeanPool(nn.Module):
    """Conv then 2x2 mean pool (layers.py:357-374)."""

    features: int
    kernel: int = 3
    biases: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = ncsn_conv(self.features, self.kernel, bias=self.biases, name="conv")(x)
        return (
            h[:, ::2, ::2, :] + h[:, 1::2, ::2, :]
            + h[:, ::2, 1::2, :] + h[:, 1::2, 1::2, :]
        ) / 4.0


class MeanPoolConv(nn.Module):
    """2x2 mean pool then conv (layers.py:377-387)."""

    features: int
    kernel: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        x = (
            x[:, ::2, ::2, :] + x[:, 1::2, ::2, :]
            + x[:, ::2, 1::2, :] + x[:, 1::2, 1::2, :]
        ) / 4.0
        return ncsn_conv(self.features, self.kernel, bias=self.biases, name="conv")(x)


class UpsampleConv(nn.Module):
    """Pixel-shuffle 2x upsample then conv (layers.py:390-401)."""

    features: int
    kernel: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.concatenate([x, x, x, x], axis=-1)  # [B, H, W, 4C]
        # depth-to-space (pixel shuffle), factor 2
        x = x.reshape(b, h, w, 2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        x = x.reshape(b, h * 2, w * 2, c)
        return ncsn_conv(self.features, self.kernel, bias=self.biases, name="conv")(x)


class AttnBlock(nn.Module):
    """Pre-pp channel-wise self-attention (layers.py:558-576)."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = group_norm(c, name="GroupNorm_0")(x)
        q = NIN(c, name="NIN_0")(h)
        k = NIN(c, name="NIN_1")(h)
        v = NIN(c, name="NIN_2")(h)
        w = jnp.einsum("bhwc,bijc->bhwij", q, k) * (int(c) ** (-0.5))
        w = w.reshape(b, hh, ww, hh * ww)
        w = jax.nn.softmax(w, axis=-1)
        w = w.reshape(b, hh, ww, hh, ww)
        h = jnp.einsum("bhwij,bijc->bhwc", w, v)
        h = NIN(c, init_scale=0.0, name="NIN_3")(h)
        return x + h


class ResnetBlockDDPM(nn.Module):
    """Pre-pp DDPM resblock (layers.py:612-662)."""

    act: Callable
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch if self.out_ch else in_ch
        h = self.act(group_norm(in_ch, name="GroupNorm_0")(x))
        h = nn.Conv(out_ch, (3, 3), padding="SAME", kernel_init=default_init(),
                    bias_init=nn.initializers.zeros, name="Conv_0")(h)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros, name="Dense_0")(
                self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(out_ch, (3, 3), padding="SAME",
                    kernel_init=default_init(1e-10),
                    bias_init=nn.initializers.zeros, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), padding="SAME",
                            kernel_init=default_init(), name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        return x + h
