"""Adaptive Dormand-Prince RK45 ODE solver in pure JAX.

The reference's probability-flow ODE sampler flattens tensors to numpy and
calls ``scipy.integrate.solve_ivp`` with a host round-trip on *every* RHS
evaluation (sgmse/sampling/__init__.py:95-171). This solver keeps the whole
adaptive integration on-device inside one ``lax.while_loop``-driven XLA
program; complex state is supported natively.

Matches scipy's RK45 controller: RMS error norm with
``scale = atol + rtol * max(|y0|, |y1|)``, safety factor 0.9, growth clamp
[0.2, 10], and scipy's automatic initial-step selection.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Dormand-Prince (RK45) Butcher tableau, as used by scipy.integrate.RK45.
# HOST numpy constants: building them with jnp at import time would run an
# eager device op on module import, which must never happen (a broken ambient
# TPU client raises on the first op — __graft_entry__'s hardening contract).
# They become on-device constants when traced.
import numpy as np

_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0], dtype=np.float32)
_A = [
    np.array([], dtype=np.float32),
    np.array([1 / 5], dtype=np.float32),
    np.array([3 / 40, 9 / 40], dtype=np.float32),
    np.array([44 / 45, -56 / 15, 32 / 9], dtype=np.float32),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
             dtype=np.float32),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
             dtype=np.float32),
]
_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
              dtype=np.float32)
# Error weights: b - b_hat (5th order minus embedded 4th order), incl. k7 term.
_E = np.array(
    [71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200, 22 / 525, -1 / 40],
    dtype=np.float32,
)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -1 / 5  # error estimator order 4 -> exponent -1/(4+1)


class ODEResult(NamedTuple):
    y: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray  # 0 = success, 1 = step size underflow


def _rms_norm(x, scale):
    r = jnp.abs(x) / scale
    return jnp.sqrt(jnp.mean(r * jnp.conj(r)).real)


def _initial_step(f, t0, y0, f0, direction, rtol, atol):
    """scipy.integrate._ivp.common.select_initial_step."""
    scale = atol + rtol * jnp.abs(y0)
    d0 = _rms_norm(y0, scale)
    d1 = _rms_norm(f0, scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * direction * f0
    f1 = f(t0 + h0 * direction, y1)
    d2 = _rms_norm(f1 - f0, scale) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** 0.2,
    )
    return jnp.minimum(100 * h0, h1)


def solve_ivp_rk45(
    f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    t_span: tuple,
    y0: jnp.ndarray,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 10_000,
) -> ODEResult:
    """Integrate dy/dt = f(t, y) from t_span[0] to t_span[1] (either direction).

    Args:
        f: RHS function (t: scalar, y: array) -> array; may be complex.
        y0: initial state.

    Returns:
        ODEResult(y at t1, number of RHS evaluations, status).
    """
    t0, t1 = t_span
    t0 = jnp.asarray(t0, dtype=jnp.float32)
    t1 = jnp.asarray(t1, dtype=jnp.float32)
    direction = jnp.sign(t1 - t0)

    f0 = f(t0, y0)
    h0 = _initial_step(f, t0, y0, f0, direction, rtol, atol)
    h0 = jnp.minimum(h0, jnp.abs(t1 - t0))

    def step_once(t, y, fk, h):
        """One RK45 step attempt of size h (in direction `direction`)."""
        hd = (h * direction).astype(jnp.float32)
        ks = [fk]
        for i in range(1, 6):
            a = _A[i]
            incr = sum(a[j].astype(jnp.float32) * ks[j] for j in range(i))
            ks.append(f(t + _C[i] * hd, y + hd.astype(y.dtype) * incr))
        incr = sum(_B[j].astype(jnp.float32) * ks[j] for j in range(6))
        y_new = y + hd.astype(y.dtype) * incr
        f_new = f(t + hd, y_new)
        ks.append(f_new)
        err = hd.astype(y.dtype) * sum(_E[j].astype(jnp.float32) * ks[j] for j in range(7))
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        err_norm = _rms_norm(err, scale)
        return y_new, f_new, err_norm

    def cond(state):
        t, y, fk, h, nfev, n, status = state
        return (direction * (t1 - t) > 1e-12) & (n < max_steps) & (status == 0)

    def body(state):
        t, y, fk, h, nfev, n, status = state
        h = jnp.minimum(h, jnp.abs(t1 - t))
        y_new, f_new, err_norm = step_once(t, y, fk, h)
        nfev = nfev + 6
        accept = err_norm <= 1.0
        factor = jnp.where(
            err_norm == 0.0,
            _MAX_FACTOR,
            jnp.clip(_SAFETY * err_norm**_ORDER_EXP, _MIN_FACTOR, _MAX_FACTOR),
        )
        factor = jnp.where(accept, factor, jnp.minimum(factor, 1.0))
        h_next = h * factor
        status = jnp.where(h_next < 1e-10, jnp.int32(1), status)
        t = jnp.where(accept, t + h * direction, t)
        y = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), y_new, y)
        fk = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), f_new, fk)
        return (t, y, fk, h_next, nfev, n + 1, status)

    state = (t0, y0, f0, h0, jnp.int32(2), jnp.int32(0), jnp.int32(0))
    t, y, fk, h, nfev, n, status = jax.lax.while_loop(cond, body, state)
    return ODEResult(y=y, nfev=nfev, status=status)
