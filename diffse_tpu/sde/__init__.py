"""Forward/reverse SDE definitions as pure, jit-friendly dataclasses.

TPU-native re-design of the reference's SDE layer (sgmse/sdes.py:20-392):

  - every method is a pure jnp function of ``(x, t, y)``; no tensors are ever
    detached to the host (the reference round-trips to numpy for scipy's expi
    on every BBED std evaluation, sgmse/sdes.py:287-293 — here Ei runs
    on-device, see diffse_tpu/ops/expi.py), so a full reverse trajectory
    compiles into ONE XLA program.
  - randomness is explicit: ``prior_sampling`` takes a PRNG key.
  - the classes are frozen dataclasses; eval-time mutations of ``T``/``N``
    (reference eval.py:105-113) become ``dataclasses.replace``.

SDE API: ``sde() / marginal_prob() / prior_sampling() / discretize() /
reverse()`` mirroring sgmse/sdes.py:20-146.
"""

from __future__ import annotations

import abc
import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.expi import expi
from ..registry import Registry
from ..utils import randn_like

SDERegistry = Registry("SDE")


def _bc(t: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a [B] time vector against [B, C, F, T] data."""
    return t[:, None, None, None]


@dataclasses.dataclass(frozen=True)
class SDE(abc.ABC):
    """SDE abstract base. Methods operate on mini-batches ``x: [B, ...]``,
    ``t: [B]`` and the conditioning mean ``y: [B, ...]``."""

    @property
    @abc.abstractmethod
    def T(self) -> float:
        """End time of the SDE (reverse-process starting point)."""

    @abc.abstractmethod
    def sde(self, x, t, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Drift f(x, t) ([B, ...]) and scalar diffusion g(t) ([B])."""

    @abc.abstractmethod
    def marginal_prob(self, x0, t, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean/std of the perturbation kernel p_t(x | x0, y)."""

    def prior_sampling(self, key: jax.Array, y: jnp.ndarray):
        """Sample x_T = y + z * std(T) (sgmse/sdes.py:225-232, 298-304).

        Returns (x_T, z) with z ~ CN(0, 1) for complex inputs.
        """
        t = jnp.full((y.shape[0],), self.T, dtype=jnp.float32)
        std = self._std(t)
        z = randn_like(key, y)
        return y + z * _bc(std).astype(y.dtype), z

    @abc.abstractmethod
    def _std(self, t) -> jnp.ndarray:
        ...

    def discretize(self, x, t, y, stepsize):
        """Euler-Maruyama discretization: f_i = drift*dt, G_i = g*sqrt(dt)
        (sgmse/sdes.py:73-91)."""
        dt = stepsize
        drift, diffusion = self.sde(x, t, y)
        f = drift * dt
        g = diffusion * jnp.sqrt(jnp.asarray(dt, dtype=jnp.float32))
        return f, g

    def reverse(self, score_fn: Callable, probability_flow: bool = False) -> "ReverseSDE":
        """Build the reverse-time SDE/ODE around a score function
        ``score_fn(x, t, y) -> score`` (sgmse/sdes.py:93-142)."""
        return ReverseSDE(fwd=self, score_fn=score_fn, probability_flow=probability_flow)

    # -- exponential-integrator support (beyond reference) ------------------
    #
    # Every SDE in this family has an affine perturbation kernel
    #     p_t(x | x0, y) = N( alpha(t) x0 + beta(t) y,  std(t)² )
    # so its probability flow transports Gaussian quantiles exactly:
    #     x(t2) = m(t2) + (std(t2)/std(t1)) (x(t1) - m(t1)).
    # The exponential predictors (sampling/predictors.py exp_euler/exp_heun)
    # exploit this in data-prediction parameterization (the DDIM/DPM-Solver
    # structure): Tweedie-estimate m(t1) = x + std² score, invert the mean
    # coefficients for x̂0, and take the closed-form flow step — both the
    # bridge-drift singularity (alpha -> 0 at t -> Tc) and the score
    # singularity (1/std at std -> 0) are absorbed analytically; only the
    # x̂0 estimate is approximated. Subclasses provide:

    def mean_coeffs(self, t):
        """(alpha(t), beta(t)) with marginal mean = alpha x0 + beta y."""
        raise NotImplementedError(
            f"{type(self).__name__} does not define mean_coeffs for the "
            "exponential integrators")

    def replace(self, **kwargs) -> "SDE":
        return dataclasses.replace(self, **kwargs)

    @staticmethod
    def add_argparse_args(parser):
        return parser


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Reverse-time SDE built from a forward SDE + score model."""

    fwd: SDE
    score_fn: Callable
    probability_flow: bool = False

    @property
    def T(self) -> float:
        return self.fwd.T

    @property
    def N(self) -> int:
        return self.fwd.N

    def sde(self, x, t, y):
        parts = self.rsde_parts(x, t, y)
        return parts["total_drift"], parts["diffusion"]

    def rsde_parts(self, x, t, y):
        sde_drift, sde_diffusion = self.fwd.sde(x, t, y)
        score = self.score_fn(x, t, y)
        score_drift = (
            -_bc(sde_diffusion) ** 2 * score * (0.5 if self.probability_flow else 1.0)
        )
        diffusion = (
            jnp.zeros_like(sde_diffusion) if self.probability_flow else sde_diffusion
        )
        total_drift = sde_drift + score_drift
        return {
            "total_drift": total_drift,
            "diffusion": diffusion,
            "sde_drift": sde_drift,
            "sde_diffusion": sde_diffusion,
            "score_drift": score_drift,
            "score": score,
        }

    def discretize(self, x, t, y, stepsize):
        """Discretized reverse iteration rule (sgmse/sdes.py:132-140)."""
        f, g = self.fwd.discretize(x, t, y, stepsize)
        rev_f = f - _bc(g) ** 2 * self.score_fn(x, t, y) * (
            0.5 if self.probability_flow else 1.0
        )
        rev_g = jnp.zeros_like(g) if self.probability_flow else g
        return rev_f, rev_g


@SDERegistry.register("ouve")
@dataclasses.dataclass(frozen=True)
class OUVESDE(SDE):
    """Ornstein-Uhlenbeck Variance-Exploding SDE (sgmse/sdes.py:149-235).

        dx = theta (y - x) dt + sigma_min (sigma_max/sigma_min)^t
             * sqrt(2 log(sigma_max/sigma_min)) dw
    """

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 1000
    T_: float = 1.0  # mutable-in-spirit: eval replaces via .replace(T_=...)

    @property
    def T(self) -> float:
        return self.T_

    @property
    def logsig(self) -> float:
        return math.log(self.sigma_max / self.sigma_min)

    def sde(self, x, t, y):
        drift = self.theta * (y - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * math.sqrt(2 * self.logsig)
        return drift, diffusion

    def _mean(self, x0, t, y):
        exp_interp = _bc(jnp.exp(-self.theta * t)).astype(x0.dtype)
        return exp_interp * x0 + (1 - exp_interp) * y

    def _std(self, t):
        sigma_min, theta, logsig = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (
                sigma_min**2
                * jnp.exp(-2 * theta * t)
                * (jnp.exp(2 * (theta + logsig) * t) - 1)
                * logsig
            )
            / (theta + logsig)
        )

    def marginal_prob(self, x0, t, y):
        return self._mean(x0, t, y), self._std(t)

    def mean_coeffs(self, t):
        alpha = jnp.exp(-self.theta * t)
        return alpha, 1.0 - alpha

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--sde-n", dest="N", type=int, default=1000,
                            help="The number of timesteps in the SDE discretization.")
        parser.add_argument("--theta", type=float, default=1.5,
                            help="The constant stiffness of the Ornstein-Uhlenbeck process.")
        parser.add_argument("--sigma-min", dest="sigma_min", type=float, default=0.05)
        parser.add_argument("--sigma-max", dest="sigma_max", type=float, default=0.5)
        return parser


@SDERegistry.register("bbed")
@dataclasses.dataclass(frozen=True)
class BBED(SDE):
    """Brownian Bridge with Exploding Diffusion coefficient (sgmse/sdes.py:240-307).

        dx = (y - x)/(Tc - t) dt + sqrt(theta) k^t dw,   Tc = 1
    """

    T_sampling: float = 0.999
    k: float = 2.6
    theta: float = 0.52
    N: int = 30

    Tc: float = 1.0

    @property
    def T(self) -> float:
        return self.T_sampling

    @property
    def logk(self) -> float:
        return math.log(self.k)

    def sde(self, x, t, y):
        drift = (y - x) / _bc(1.0 * self.Tc - t).astype(x.dtype)
        sigma = self.k**t
        diffusion = sigma * math.sqrt(self.theta)
        return drift, diffusion

    def _mean(self, x0, t, y):
        time = _bc(t / self.Tc).astype(x0.dtype)
        return x0 * (1 - time) + y * time

    def _std(self, t):
        # Var(t) = theta (1-t) [ (k^{2t} - 1 + t) + 2 k^2 log k (1-t)
        #          (Ei(2(t-1) log k) - Ei(-2 log k)) ]
        # evaluated fully on-device (reference does a CPU numpy round-trip,
        # sgmse/sdes.py:287-293).
        logk = self.logk
        Eilog = expi(jnp.asarray(-2.0 * logk))
        Eis = expi(2.0 * (t - 1.0) * logk) - Eilog
        h = 2.0 * self.k**2 * logk
        var = (self.k ** (2.0 * t) - 1.0 + t) + h * (1.0 - t) * Eis
        var = var * (1.0 - t) * self.theta
        return jnp.sqrt(var)

    def marginal_prob(self, x0, t, y):
        return self._mean(x0, t, y), self._std(t)

    # linear bridge mean x0 (1 - t/Tc) + y t/Tc; alpha -> 0 at t -> Tc is the
    # ~1/(1-t) stiffness that breaks explicit integrators (DEVNOTES round 4) —
    # the exponential predictors absorb it in closed form.
    def mean_coeffs(self, t):
        beta = t / self.Tc
        return 1.0 - beta, beta

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--sde-n", dest="N", type=int, default=30,
                            help="The number of timesteps in the SDE discretization.")
        parser.add_argument("--T_sampling", type=float, default=0.999,
                            help="The T so that t < T during sampling in the train step.")
        parser.add_argument("--k", type=float, default=2.6,
                            help="base factor for diffusion term")
        parser.add_argument("--theta", type=float, default=0.52,
                            help="root scale factor for diffusion term.")
        return parser


@SDERegistry.register("proposed_1")
@dataclasses.dataclass(frozen=True)
class PROPOSED_1(SDE):
    """BBED reparameterized via sigma_min/sigma_max, k = sigma_max/sigma_min
    (sgmse/sdes.py:314-392). NOTE: faithfully reproduces the reference's
    diffusion ``sigma = sigma_max * t`` (sgmse/sdes.py:359), which differs from
    BBED's ``k^t`` — this is the legacy class kept for checkpoint/capability
    parity ("bbve" alias remaps to BBED at model construction,
    sgmse/model.py:70-77).
    """

    T_sampling: float = 0.99
    sigma_min: float = 1.0
    sigma_max: float = 1.0
    theta: float = 0.53
    N: int = 1000

    Tc: float = 1.0

    @property
    def T(self) -> float:
        return self.T_sampling

    @property
    def logsig(self) -> float:
        return math.log(self.sigma_max / self.sigma_min)

    @property
    def ratio(self) -> float:
        return self.sigma_max / self.sigma_min

    def sde(self, x, t, y):
        drift = (y - x) / _bc(1.0 * self.Tc - t).astype(x.dtype)
        sigma = self.sigma_max * t
        diffusion = sigma * math.sqrt(self.theta)
        return drift, diffusion

    def _mean(self, x0, t, y):
        time = _bc(t / self.Tc).astype(x0.dtype)
        return x0 * (1 - time) + y * time

    def _std(self, t):
        logsig = self.logsig
        Eilog = expi(jnp.asarray(-2.0 * logsig))
        Eis = expi(2.0 * (t - 1.0) * logsig) - Eilog
        h = 2.0 * self.sigma_max**2 * logsig
        var = self.sigma_min**2 * (self.ratio ** (2.0 * t) - 1.0 + t) + h * (1.0 - t) * Eis
        var = var * (1.0 - t) * self.theta
        return jnp.sqrt(var)

    def marginal_prob(self, x0, t, y):
        return self._mean(x0, t, y), self._std(t)

    # same linear bridge mean as BBED
    def mean_coeffs(self, t):
        beta = t / self.Tc
        return 1.0 - beta, beta

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--sde-n", dest="N", type=int, default=1000)
        parser.add_argument("--T_sampling", type=float, default=0.99)
        parser.add_argument("--sigma-min", dest="sigma_min", type=float, default=1.0)
        parser.add_argument("--sigma-max", dest="sigma_max", type=float, default=1.0)
        parser.add_argument("--theta", type=float, default=0.53)
        return parser


__all__ = ["SDERegistry", "SDE", "ReverseSDE", "OUVESDE", "BBED", "PROPOSED_1"]
