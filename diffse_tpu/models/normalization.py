"""Normalization library (NCSNv1/v2 legacy capability).

Flax twins of sgmse/backbones/ncsnpp_utils/normalization.py:22-215. Only plain
GroupNorm is used by the live NCSN++ path (SURVEY.md L1); these variants —
(Conditional)InstanceNorm++, VarianceNorm, conditional batch/none norms — are
kept for backbone-capability parity with the score_sde lineage.

All modules are NHWC; "conditional" variants take integer class labels `y`.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp


def get_normalization(norm: str, conditional: bool = False, num_classes: int = 10):
    """Normalization dispatcher (normalization.py:22-40)."""
    if conditional:
        if norm == "InstanceNorm++":
            return functools.partial(ConditionalInstanceNorm2dPlus, num_classes=num_classes)
        raise NotImplementedError(f"{norm} not implemented yet.")
    if norm == "InstanceNorm":
        return InstanceNorm2d
    elif norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    elif norm == "VarianceNorm":
        return VarianceNorm2d
    elif norm == "GroupNorm":
        return nn.GroupNorm
    raise ValueError(f"Unknown normalization: {norm}")


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel spatial normalization (torch InstanceNorm2d
    with affine=False), NHWC."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.epsilon)


class VarianceNorm2d(nn.Module):
    """Scale-only normalization by spatial variance (normalization.py:111-124)."""

    bias: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        return alpha.reshape(1, 1, 1, -1) * h


class NoneNorm2d(nn.Module):
    """Identity (normalization.py:149-154)."""

    @nn.compact
    def __call__(self, x):
        return x


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (normalization.py:157-184): instance norm plus a
    re-injected, batch-standardized channel-mean pathway to fix instance
    norm's loss of per-channel DC information."""

    bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
        gamma = self.param("gamma", nn.initializers.normal(0.02), (c,)) + 1.0

        means = jnp.mean(x, axis=(1, 2))  # [B, C]
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means = (means - m) / jnp.sqrt(v + 1e-5)

        h = InstanceNorm2d()(x)
        h = h + means[:, None, None, :] * alpha.reshape(1, 1, 1, -1)
        out = gamma.reshape(1, 1, 1, -1) * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (c,))
            out = out + beta.reshape(1, 1, 1, -1)
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++ (normalization.py:187-215)."""

    num_classes: int = 10
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        n_embed = 3 * c if self.bias else 2 * c

        def embed_init(key, shape, dtype=jnp.float32):
            w = nn.initializers.normal(0.02)(key, shape, dtype) + 1.0
            if self.bias:
                w = w.at[:, 2 * c :].set(0.0)
            return w

        embed = nn.Embed(self.num_classes, n_embed, embedding_init=embed_init,
                         name="embed")(y)

        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means = (means - m) / jnp.sqrt(v + 1e-5)
        h = InstanceNorm2d()(x)

        if self.bias:
            gamma, alpha, beta = embed[:, :c], embed[:, c : 2 * c], embed[:, 2 * c :]
            h = h + means[:, None, None, :] * alpha[:, None, None, :]
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        gamma, alpha = embed[:, :c], embed[:, c:]
        h = h + means[:, None, None, :] * alpha[:, None, None, :]
        return gamma[:, None, None, :] * h


class ConditionalVarianceNorm2d(nn.Module):
    """Class-conditional variance norm (normalization.py:95-108)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        embed = nn.Embed(
            self.num_classes, c,
            embedding_init=lambda k, s, d=jnp.float32: nn.initializers.normal(0.02)(k, s, d) + 1.0,
            name="embed",
        )(y)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        return embed[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
    """Class-conditional affine without normalization (normalization.py:127-146)."""

    num_classes: int = 10
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        n_embed = 2 * c if self.bias else c

        def embed_init(key, shape, dtype=jnp.float32):
            w = nn.initializers.uniform(scale=1.0)(key, shape, dtype)
            if self.bias:
                w = w.at[:, c:].set(0.0)
            return w

        embed = nn.Embed(self.num_classes, n_embed, embedding_init=embed_init,
                         name="embed")(y)
        if self.bias:
            gamma, beta = embed[:, :c], embed[:, c:]
            return gamma[:, None, None, :] * x + beta[:, None, None, :]
        return embed[:, None, None, :] * x
