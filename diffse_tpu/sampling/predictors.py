"""Predictor algorithms for reverse-SDE sampling.

Functional twins of sgmse/sampling/predictors.py:9-94. ``update_fn`` takes an
explicit PRNG key and is pure, so a whole predictor-corrector trajectory can
be rolled into one ``lax.scan``.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp

from ..registry import Registry
from ..utils import randn_like

PredictorRegistry = Registry("Predictor")


def _bc(a, x):
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim)).astype(x.dtype)


class Predictor(abc.ABC):
    """Abstract predictor (sgmse/sampling/predictors.py:12-38)."""

    def __init__(self, sde, score_fn, probability_flow: bool = False):
        self.sde = sde
        self.rsde = sde.reverse(score_fn, probability_flow=probability_flow)
        self.score_fn = score_fn
        self.probability_flow = probability_flow

    @abc.abstractmethod
    def update_fn(self, key, x, t, y, stepsize):
        """One predictor update. Returns (x, x_mean)."""

    def update_mean(self, key, x, t, y, stepsize):
        """The denoised mean only (no noise injection). Used for the FINAL
        reverse step when the sampler returns x_mean (denoise=True): the
        noise add — and its PRNG draw — would be discarded, so subclasses
        may skip them entirely. Must equal ``update_fn(...)[1]``."""
        return self.update_fn(key, x, t, y, stepsize)[1]


@PredictorRegistry.register("euler_maruyama")
class EulerMaruyamaPredictor(Predictor):
    def update_fn(self, key, x, t, y, stepsize=None):
        dt = -1.0 / self.rsde.N
        z = randn_like(key, x)
        f, g = self.rsde.sde(x, t, y)
        x_mean = x + f * dt
        x = x_mean + _bc(g, x) * jnp.sqrt(-dt).astype(jnp.float32) * z
        return x, x_mean


@PredictorRegistry.register("reverse_diffusion")
class ReverseDiffusionPredictor(Predictor):
    def update_fn(self, key, x, t, y, stepsize):
        f, g = self.rsde.discretize(x, t, y, stepsize)
        z = randn_like(key, x)
        x_mean = x - f
        x = x_mean + _bc(g, x) * z
        return x, x_mean

    def update_mean(self, key, x, t, y, stepsize):
        f, _ = self.rsde.discretize(x, t, y, stepsize)
        return x - f


@PredictorRegistry.register("none")
class NonePredictor(Predictor):
    """An empty predictor that does nothing."""

    def __init__(self, *args, **kwargs):
        pass

    def update_fn(self, key, x, t, y, stepsize=None):
        return x, x
