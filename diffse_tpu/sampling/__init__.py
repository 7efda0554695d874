"""Reverse-SDE samplers compiled as single XLA programs.

TPU-native re-design of sgmse/sampling/__init__.py:28-171:

  - The N-step predictor-corrector loop is one ``jax.lax.scan`` inside one
    ``jit`` — the whole reverse SDE executes on-device with zero host
    round-trips (BASELINE.json north star).
  - The probability-flow ODE sampler uses an on-device adaptive RK45
    (diffse_tpu/sampling/ode.py) instead of scipy + flatten-to-numpy.
  - Randomness via explicit PRNG keys.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .correctors import Corrector, CorrectorRegistry
from .predictors import Predictor, PredictorRegistry, ReverseDiffusionPredictor
from .ode import solve_ivp_rk45

__all__ = [
    "PredictorRegistry",
    "CorrectorRegistry",
    "Predictor",
    "Corrector",
    "get_pc_sampler",
    "get_ode_sampler",
    "timesteps_space",
]


def timesteps_space(sde_t: float, sde_n: int, eps: float, timestep_type: str = "linear"):
    """Time grid from T down to eps (sgmse/sampling/__init__.py:84-91).

    ``"linear"`` (reference semantics): ``np.linspace(T, eps, N)``.

    ``"bridge_geom"`` (beyond-reference): geometric spacing in ``(1 - t)`` —
    steps cluster at the bridge's singular end t->1 where BBED's reverse
    drift carries ``(y-x)/(1-t)``. An explicit fixed-step integrator on the
    linear grid has ``|h/(1-t)| >> 1`` at the first reverse steps for any
    practical N and diverges immediately (measured: the heun predictor
    collapsed N-independently on a trained net, while the adaptive RK45 —
    which shrinks h near t=T — was healthy; DEVNOTES round 4). Geometric
    spacing keeps the local stiffness number ``h_i/(1-t_i) = r - 1``
    constant across the grid.

    ``"logit"`` (beyond-reference): uniform spacing in ``log(t/(1-t))`` —
    steps cluster at BOTH singular ends. Bridge processes are stiff at t->1
    (drift ``~1/(1-t)``) *and* t->0 (score ``~1/sigma(t)^2`` with
    ``sigma -> 0``); ``h_i ~ du * t(1-t)`` bounds the local stiffness
    number ``h_i * |lambda_i|`` by a constant at both ends. The analog of
    EDM's rho-grid for sigma-parameterized diffusions (Karras et al. 2022,
    eq. 5), adapted to the bridge's two-sided singularity.

    Both alternatives are closed form, so the scan still computes t from a
    carried counter.
    """
    if timestep_type in ("bridge_geom", "logit"):
        if sde_n < 2 or not (0.0 < eps < sde_t < 1.0):
            raise ValueError(
                f"{timestep_type} grid needs N>=2 and 0 < eps < T < 1; "
                f"got T={sde_t}, eps={eps}, N={sde_n}"
            )
        if timestep_type == "bridge_geom":
            u = np.geomspace(1.0 - sde_t, 1.0 - eps, sde_n)
            return (1.0 - u).astype(np.float32)
        logit = lambda t: np.log(t / (1.0 - t))
        u = np.linspace(logit(sde_t), logit(eps), sde_n)
        return (1.0 / (1.0 + np.exp(-u))).astype(np.float32)
    timesteps = np.linspace(sde_t, eps, sde_n, dtype=np.float32)
    if timestep_type in (None, "linear"):
        return timesteps
    # The reference silently falls through to the linear grid for any other
    # value; alternative schedules can be registered here.
    return timesteps


def get_pc_sampler(
    predictor_name: str,
    corrector_name: str,
    sde,
    score_fn: Callable,
    Y: jnp.ndarray,
    Y_prior: Optional[jnp.ndarray] = None,
    denoise: bool = True,
    eps: float = 3e-2,
    snr: float = 0.1,
    corrector_steps: int = 1,
    probability_flow: bool = False,
    intermediate: bool = False,
    timestep_type: Optional[str] = "linear",
    unroll: int = 1,
    peel_last: Optional[bool] = None,
    **ignored_kwargs,
):
    """Create a predictor-corrector sampler (sgmse/sampling/__init__.py:28-80).

    Args:
        sde: forward SDE (its ``N`` gives the number of reverse steps).
        score_fn: ``(x, t, y) -> score``, closing over network params.
        Y: conditioning spectrogram ``[B, C, F, T]``.
        Y_prior: optional prior-mean override (defaults to Y).

    Returns:
        ``sampler(key) -> (sample, ns)`` where the N-step loop is a single
        ``lax.scan``; jit-compatible and differentiable-free (inference only).
        With ``intermediate=True``, ``sampler(key) -> (trajectory, ns)`` where
        ``trajectory`` has a leading time axis of length N (the per-step
        denoised means ``x_mean``, or raw ``x`` when ``denoise=False``) and
        ``trajectory[-1]`` equals the non-intermediate sample. (The reference
        gates on the same flag but returns an *undefined name*,
        sgmse/sampling/__init__.py:77-78 — a documented quirk fix; the scan's
        stacked ys give the trajectory for free on TPU.)

    Note:
        ``snr`` may be a traced jnp scalar — it only enters corrector
        arithmetic, so one compiled program serves snr sweeps.
        ``corrector_steps`` stays static: it changes program structure
        (inner loop length and the NFE count).
    """
    predictor = PredictorRegistry.get_by_name(predictor_name)(
        sde, score_fn, probability_flow=probability_flow
    )
    corrector = CorrectorRegistry.get_by_name(corrector_name)(
        sde, score_fn, snr=snr, n_steps=corrector_steps
    )

    timesteps = timesteps_space(sde.T, sde.N, eps, timestep_type)
    n_steps = len(timesteps)
    # Both grids are closed-form, so the scan carries only a step counter and
    # computes t_i on the fly instead of scanning over a schedule array (one
    # less per-step gather; also works around TPU backends where scan-over-xs
    # with large complex carries is unsupported).
    # stepsize_i = t_i - t_{i+1}; the final step integrates the remaining
    # t_{N-1} (== eps) down to 0 (sgmse/sampling/__init__.py:64-69).
    t0 = float(timesteps[0])
    t_last = float(timesteps[-1])
    if timestep_type == "bridge_geom" and n_steps > 1:
        # t_i = 1 - (1-t0) * r^i  with  r = ((1-eps)/(1-T))^(1/(N-1)) > 1;
        # then (1 - t_{i+1}) = (1 - t_i) * r, so the stepsize needs no
        # second exp.
        _r = float(((1.0 - t_last) / (1.0 - t0)) ** (1.0 / (n_steps - 1)))
        _log_r = float(np.log(_r))
        _u0 = 1.0 - t0

        def t_of(i):
            return 1.0 - _u0 * jnp.exp(i * _log_r)

        def step_of(i, t):
            return jnp.where(i < n_steps - 1, (1.0 - t) * (_r - 1.0), t_last)

    elif timestep_type == "logit" and n_steps > 1:
        # t_i = sigmoid(u0 + i*du), u = log(t/(1-t)) uniform (du < 0).
        _lu0 = float(np.log(t0 / (1.0 - t0)))
        _du = float(
            (np.log(t_last / (1.0 - t_last)) - _lu0) / (n_steps - 1)
        )

        def t_of(i):
            return jax.nn.sigmoid(_lu0 + i * _du)

        def step_of(i, t):
            t_next = jax.nn.sigmoid(_lu0 + (i + 1.0) * _du)
            return jnp.where(i < n_steps - 1, t - t_next, t_last)

    else:
        delta = float(timesteps[0] - timesteps[1]) if n_steps > 1 else t0

        def t_of(i):
            return t0 - i * delta

        def step_of(i, t):
            return jnp.where(i < n_steps - 1, delta, t_last)

    y_cond = Y
    y_prior = Y if Y_prior is None else Y_prior
    batch = Y.shape[0]

    # Optionally peel the FINAL corrector+predictor step out of the scan when
    # only the denoised mean is returned: the scan then carries just
    # (x, key, i) and the final predictor computes x_mean directly, skipping
    # the noise draw + add that denoise=True discards. Results are identical
    # up to f32 fusion rounding (equivalence test in test_sampling.py).
    # DEFAULT OFF: measured on TPU v5e (DEVNOTES round 3), XLA already
    # buffer-aliases the x_mean carry — the peel changed device time by 0.0%
    # while the doubled network inline (scan body + peeled step) made the
    # remote compile 2.5x slower (1433 s vs 567 s).
    if peel_last is None:
        peel_last = False
    peel = bool(peel_last) and denoise and not intermediate and n_steps >= 1

    def step_update(x, k, i):
        k, kc, kp = jax.random.split(k, 3)
        t = t_of(i)
        stepsize = step_of(i, t)
        vec_t = jnp.full((batch,), 1.0, dtype=jnp.float32) * t
        x, x_mean = corrector.update_fn(kc, x, vec_t, y_cond)
        x, x_mean = predictor.update_fn(kp, x, vec_t, y_cond, stepsize)
        return x, x_mean, k

    def pc_sampler(key: jax.Array):
        prior_key, scan_key = jax.random.split(key)
        xt, _ = sde.prior_sampling(prior_key, y_prior)
        ns = n_steps * (corrector.n_steps
                        + getattr(predictor, "nfe_per_step", 1))

        if peel:
            def body(carry, _):
                x, k, i = carry
                x, _, k = step_update(x, k, i)
                return (x, k, i + 1.0), None

            init = (xt, scan_key, jnp.asarray(0.0, dtype=jnp.float32))
            (x, k, i), _ = jax.lax.scan(
                body, init, None, length=n_steps - 1, unroll=unroll
            )
            # final step, same f32 arithmetic as in-scan (t from the
            # carried counter, not the numpy grid value)
            k, kc, kp = jax.random.split(k, 3)
            t = t_of(i)
            vec_t = jnp.full((batch,), 1.0, dtype=jnp.float32) * t
            x, _ = corrector.update_fn(kc, x, vec_t, y_cond)
            x_mean = predictor.update_mean(kp, x, vec_t, y_cond, t_last)
            return x_mean, ns

        def body(carry, _):
            x, x_mean, k, i = carry
            x, x_mean, k = step_update(x, k, i)
            ys = (x_mean if denoise else x) if intermediate else None
            return (x, x_mean, k, i + 1.0), ys

        init = (xt, xt, scan_key, jnp.asarray(0.0, dtype=jnp.float32))
        (xt, xt_mean, _, _), traj = jax.lax.scan(
            body, init, None, length=n_steps, unroll=unroll
        )
        if intermediate:
            return traj, ns
        x_result = xt_mean if denoise else xt
        return x_result, ns

    return pc_sampler


def get_ode_sampler(
    sde,
    score_fn: Callable,
    y: jnp.ndarray,
    Y_prior: Optional[jnp.ndarray] = None,
    inverse_scaler: Optional[Callable] = None,
    denoise: bool = True,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    timestep_type: Optional[str] = None,
    eps: float = 3e-2,
    **ignored_kwargs,
):
    """Probability-flow ODE sampler (sgmse/sampling/__init__.py:95-171) with an
    on-device adaptive RK45 instead of scipy's host-side solver."""
    predictor = ReverseDiffusionPredictor(sde, score_fn, probability_flow=False)
    rsde = sde.reverse(score_fn, probability_flow=True)
    y_prior = y if Y_prior is None else Y_prior

    def denoise_update_fn(key, x):
        vec_eps = jnp.full((x.shape[0],), eps, dtype=jnp.float32)
        _, x = predictor.update_fn(key, x, vec_eps, y, 0.03)
        return x

    def drift_fn(x, t, y_):
        return rsde.sde(x, t, y_)[0]

    def ode_sampler(key: jax.Array):
        prior_key, denoise_key = jax.random.split(key)
        xt, _ = sde.prior_sampling(prior_key, y_prior)

        def ode_func(t, x):
            vec_t = jnp.full((y.shape[0],), t, dtype=jnp.float32)
            return drift_fn(x, vec_t, y)

        result = solve_ivp_rk45(ode_func, (sde.T, eps), xt, rtol=rtol, atol=atol)
        x = result.y
        if denoise:
            x = denoise_update_fn(denoise_key, x)
        if inverse_scaler is not None:
            x = inverse_scaler(x)
        return x, result.nfev

    return ode_sampler
