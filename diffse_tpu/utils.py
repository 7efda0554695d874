"""Small shared helpers (random sampling, broadcasting)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def randn_like(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal noise with torch.randn_like semantics.

    For complex dtypes torch samples CN(0, 1): real/imag parts each have
    variance 1/2 (so E|z|^2 = 1). Getting this wrong silently rescales every
    sigma in the pipeline by sqrt(2) (see SURVEY.md "Hard parts").
    """
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        real_dtype = jnp.finfo(x.dtype).dtype
        k1, k2 = jax.random.split(key)
        re = jax.random.normal(k1, x.shape, dtype=real_dtype)
        im = jax.random.normal(k2, x.shape, dtype=real_dtype)
        return ((re + 1j * im) * jnp.sqrt(0.5)).astype(x.dtype)
    return jax.random.normal(key, x.shape, dtype=x.dtype)


def batch_broadcast(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a batch-shaped array `a` ([B] or scalar) against `x` ([B, ...]).

    Functional twin of the reference's batch_broadcast (sgmse/util/tensors.py:1-16).
    """
    a = jnp.asarray(a)
    if a.ndim == 0:
        return a
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim))
