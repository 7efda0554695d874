"""Shared backbone utilities (registry, embeddings, complex-valued wrappers).

Functional twins of sgmse/backbones/shared.py:10-123, as flax.linen modules in
TPU-native layouts (NHWC feature maps, HWIO conv kernels).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..registry import Registry

BackboneRegistry = Registry("Backbone")


class GaussianFourierProjection(nn.Module):
    """Gaussian random features for encoding time steps (shared.py:13-34).

    For real output the effective embedding dim is halved and sin/cos are
    concatenated; for complex output exp(1j * proj) is returned directly.
    The projection matrix is randomly initialized and FROZEN (non-trainable),
    matching ``requires_grad=False`` in the reference.
    """

    embed_dim: int
    scale: float = 16.0
    complex_valued: bool = False

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        embed_dim = self.embed_dim if self.complex_valued else self.embed_dim // 2
        w = self.param("W", nn.initializers.normal(stddev=self.scale), (embed_dim,))
        w = jax.lax.stop_gradient(w)
        t_proj = t[:, None] * w[None, :] * 2 * np.pi
        if self.complex_valued:
            return jnp.exp(1j * t_proj)
        return jnp.concatenate([jnp.sin(t_proj), jnp.cos(t_proj)], axis=-1)


class DiffusionStepEmbedding(nn.Module):
    """Diffusion-step embedding as in DiffWave (shared.py:37-57)."""

    embed_dim: int
    complex_valued: bool = False

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        embed_dim = self.embed_dim if self.complex_valued else self.embed_dim // 2
        fac = 10 ** (4 * jnp.arange(embed_dim) / (embed_dim - 1))
        inner = t[:, None] * fac[None, :]
        if self.complex_valued:
            return jnp.exp(1j * inner)
        return jnp.concatenate([jnp.sin(inner), jnp.cos(inner)], axis=-1)


class ComplexLinear(nn.Module):
    """Complex-valued linear layer (shared.py:60-75).

    F(a + ib) = (re(a) - im(b)) + i (re(b) + im(a)) with independent real
    modules re/im; reduces to a plain Dense when complex_valued=False.
    """

    output_dim: int
    complex_valued: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.complex_valued:
            re = nn.Dense(self.output_dim, name="re")
            im = nn.Dense(self.output_dim, name="im")
            return (re(x.real) - im(x.imag)) + 1j * (re(x.imag) + im(x.real))
        return nn.Dense(self.output_dim, name="lin")(x)


class FeatureMapDense(nn.Module):
    """Fully-connected layer broadcast to feature maps (shared.py:78-87).

    NHWC: output gets two singleton spatial axes *before* the channel axis.
    """

    output_dim: int
    complex_valued: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ComplexLinear(self.output_dim, complex_valued=self.complex_valued)(x)
        return y[:, None, None, :]


class ComplexConv2d(nn.Module):
    """Complex conv via complex multiplication of two real convs
    (shared.py:94-123): F(a+ib) = f1(a) - f2(b) + i(f1(b) + f2(a)).

    NHWC complex input/output.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_re = nn.Conv(self.features, self.kernel_size, self.strides, self.padding, name="re")
        conv_im = nn.Conv(self.features, self.kernel_size, self.strides, self.padding, name="im")
        return (conv_re(x.real) - conv_im(x.imag)) + 1j * (conv_re(x.imag) + conv_im(x.real))


class ComplexConvTranspose2d(nn.Module):
    """Complex transposed conv (shared.py:122-123), NHWC complex."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_re = nn.ConvTranspose(
            self.features, self.kernel_size, self.strides, self.padding, name="re"
        )
        conv_im = nn.ConvTranspose(
            self.features, self.kernel_size, self.strides, self.padding, name="im"
        )
        return (conv_re(x.real) - conv_im(x.imag)) + 1j * (conv_re(x.imag) + conv_im(x.real))
