"""Spectrogram transform tests: spec_fwd/spec_back inversion and torch parity."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffse_tpu.transforms import SpecTransformConfig, spec_fwd, spec_back, pad_spec, pad_spec_16


def _rand_complex(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("transform_type", ["exponent", "log", "none"])
def test_fwd_back_inverse(rng, transform_type):
    cfg = SpecTransformConfig(transform_type=transform_type)
    spec = _rand_complex(rng, (2, 1, 32, 40))
    back = np.asarray(spec_back(spec_fwd(jnp.asarray(spec), cfg), cfg))
    np.testing.assert_allclose(back, spec, atol=2e-5)


def test_exponent_matches_torch_reference_formula(rng):
    """|c|^e * exp(1j*angle(c)) * factor (sgmse/data_module.py:241-248)."""
    cfg = SpecTransformConfig()
    spec = _rand_complex(rng, (64, 64))
    t = torch.from_numpy(spec)
    expected = (t.abs() ** 0.5 * torch.exp(1j * t.angle()) * 0.15).numpy()
    ours = np.asarray(spec_fwd(jnp.asarray(spec), cfg))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_log_matches_torch_reference_formula(rng):
    cfg = SpecTransformConfig(transform_type="log")
    spec = _rand_complex(rng, (64, 64))
    t = torch.from_numpy(spec)
    expected = (torch.log(1 + t.abs()) * torch.exp(1j * t.angle()) * 0.15).numpy()
    ours = np.asarray(spec_fwd(jnp.asarray(spec), cfg))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_fwd_handles_zeros():
    cfg = SpecTransformConfig()
    spec = jnp.zeros((4, 4), dtype=jnp.complex64)
    out = np.asarray(spec_fwd(spec, cfg))
    assert np.all(np.isfinite(out.real)) and np.all(out == 0)


@pytest.mark.parametrize("t,expected", [(64, 64), (65, 128), (100, 128), (128, 128)])
def test_pad_spec(t, expected):
    y = jnp.ones((1, 1, 256, t))
    assert pad_spec(y).shape[-1] == expected


@pytest.mark.parametrize("t,expected", [(16, 16), (17, 32), (126, 128)])
def test_pad_spec_16(t, expected):
    y = jnp.ones((1, 2, 256, t))
    assert pad_spec_16(y).shape[-1] == expected
