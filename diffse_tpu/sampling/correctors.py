"""Corrector algorithms for reverse-SDE sampling.

Functional twins of sgmse/sampling/correctors.py:8-94 with explicit PRNG keys.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp

from ..registry import Registry
from ..utils import randn_like

CorrectorRegistry = Registry("Corrector")


def _bc(a, x):
    a = jnp.asarray(a)
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim)).astype(x.dtype)


class Corrector(abc.ABC):
    """Abstract corrector (sgmse/sampling/correctors.py:11-34)."""

    def __init__(self, sde, score_fn, snr: float, n_steps: int):
        self.rsde = sde.reverse(score_fn)
        self.sde = sde
        self.score_fn = score_fn
        self.snr = snr
        self.n_steps = n_steps

    @abc.abstractmethod
    def update_fn(self, key, x, t, y):
        """One corrector update. Returns (x, x_mean)."""


@CorrectorRegistry.register("langevin")
class LangevinCorrector(Corrector):
    def update_fn(self, key, x, t, y):
        target_snr = self.snr
        x_mean = x
        for i in range(self.n_steps):
            step_key = jax.random.fold_in(key, i)
            grad = self.score_fn(x, t, y)
            noise = randn_like(step_key, x)
            grad_norm = jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1).mean()
            noise_norm = jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1).mean()
            step_size = ((target_snr * noise_norm / grad_norm) ** 2 * 2)[None]
            x_mean = x + _bc(step_size, x) * grad
            x = x_mean + noise * _bc(jnp.sqrt(step_size * 2), x)
        return x, x_mean


@CorrectorRegistry.register("ald")
class AnnealedLangevinDynamics(Corrector):
    """Annealed Langevin dynamics: step size (snr * std)^2 * 2 from the
    marginal std (sgmse/sampling/correctors.py:59-81)."""

    def update_fn(self, key, x, t, y):
        x_mean = x
        std = self.sde.marginal_prob(x, t, y)[1]
        for i in range(self.n_steps):
            step_key = jax.random.fold_in(key, i)
            grad = self.score_fn(x, t, y)
            noise = randn_like(step_key, x)
            step_size = (self.snr * std) ** 2 * 2
            x_mean = x + _bc(step_size, x) * grad
            x = x_mean + noise * _bc(jnp.sqrt(step_size * 2), x)
        return x, x_mean


@CorrectorRegistry.register("none")
class NoneCorrector(Corrector):
    """An empty corrector that does nothing."""

    def __init__(self, *args, **kwargs):
        self.snr = 0
        self.n_steps = 0

    def update_fn(self, key, x, t, y):
        return x, x
