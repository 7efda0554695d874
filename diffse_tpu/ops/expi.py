"""On-device exponential integral Ei(x).

The BBED SDE's marginal standard deviation needs Ei(2(t-1) log k)
(reference: sgmse/sdes.py:287-293). The reference computes it by detaching `t`
to the CPU and calling ``scipy.special.expi`` — a host round-trip on *every*
reverse-SDE step (twice per step with the ALD corrector). Here Ei is evaluated
on-device with the classic power series

    Ei(x) = gamma + log|x| + sum_{n>=1} x^n / (n * n!)

which converges rapidly for |x| <= ~8; BBED evaluates it on
x = 2 (t-1) log k in (-2 log k, 0], i.e. |x| < 2 for all published configs
(k=2.6 -> |x| < 1.92). 40 terms are exact to float32 for |x| <= 8. This keeps
the entire 30-step sampler inside a single XLA program with zero host
synchronization.
"""

from __future__ import annotations

import jax.numpy as jnp

_EULER_GAMMA = 0.5772156649015328606

_NUM_TERMS = 40


def expi(x: jnp.ndarray) -> jnp.ndarray:
    """Exponential integral Ei(x) via power series (accurate for |x| <= 8).

    Matches ``scipy.special.expi`` to float32 precision on that range. Not
    intended for large |x| (the BBED use case never leaves [-2, 0)).
    """
    x = jnp.asarray(x)
    acc = jnp.zeros(x.shape, dtype=jnp.result_type(x, jnp.float32))
    term = jnp.ones_like(acc)
    # Static unroll: 40 fused multiply-adds on the VPU, negligible next to the
    # score-network forward it sits beside.
    for n in range(1, _NUM_TERMS + 1):
        term = term * x / n
        acc = acc + term / n
    return _EULER_GAMMA + jnp.log(jnp.abs(x)) + acc
