"""Legacy NCSNv1/v2 layer tests (shape/finiteness on small inputs)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.models.layers_legacy import (
    AttnBlock,
    CondCRPBlock,
    CondRCUBlock,
    CondRefineBlock,
    ConvMeanPool,
    CRPBlock,
    MeanPoolConv,
    MSFBlock,
    RCUBlock,
    RefineBlock,
    ResnetBlockDDPM,
    UpsampleConv,
)
from diffse_tpu.models.normalization import ConditionalInstanceNorm2dPlus


def _x(rng, shape=(2, 8, 8, 16)):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _run(module, *args, rngs=None):
    v = module.init(jax.random.PRNGKey(0), *args)
    return module.apply(v, *args)


def test_crp_rcu_blocks(rng):
    x = _x(rng)
    out = _run(CRPBlock(16, 2), x)
    assert out.shape == x.shape
    out = _run(RCUBlock(16, 2, 2), x)
    assert out.shape == x.shape


def test_msf_refine_blocks(rng):
    x1 = _x(rng, (2, 8, 8, 16))
    x2 = _x(rng, (2, 4, 4, 32))
    out = _run(MSFBlock(24), [x1, x2], (8, 8))
    assert out.shape == (2, 8, 8, 24)
    out = _run(RefineBlock(24), [x1, x2], (8, 8))
    assert out.shape == (2, 8, 8, 24)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cond_blocks(rng):
    norm = ConditionalInstanceNorm2dPlus
    x = _x(rng)
    y = jnp.asarray([0, 1])
    out = _run(CondCRPBlock(16, 2, 4, norm), x, y)
    assert out.shape == x.shape
    out = _run(CondRCUBlock(16, 2, 2, 4, norm), x, y)
    assert out.shape == x.shape
    # single-input refine: the reference contract assumes in_planes[0] ==
    # features (no MSF runs to adapt the channel count, layers.py:336-341)
    out = _run(CondRefineBlock(16, 4, norm), [x], y, (8, 8))
    assert out.shape == (2, 8, 8, 16)


def test_pool_convs(rng):
    x = _x(rng)
    out = _run(ConvMeanPool(8), x)
    assert out.shape == (2, 4, 4, 8)
    out = _run(MeanPoolConv(8), x)
    assert out.shape == (2, 4, 4, 8)
    out = _run(UpsampleConv(8), x)
    assert out.shape == (2, 16, 16, 8)


def test_legacy_attn_and_resblock(rng):
    x = _x(rng)
    out = _run(AttnBlock(), x)
    assert out.shape == x.shape
    out = _run(ResnetBlockDDPM(act=jax.nn.silu, out_ch=24), x)
    assert out.shape == (2, 8, 8, 24)
