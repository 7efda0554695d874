"""SDE math tests: closed-form means/stds vs scipy golden values, expi parity,
prior sampling statistics, and reverse-SDE consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sc

from diffse_tpu.ops import expi
from diffse_tpu.sde import BBED, OUVESDE, PROPOSED_1, SDERegistry


def test_expi_matches_scipy():
    x = np.concatenate(
        [-np.linspace(0.001, 8.0, 300), np.linspace(0.001, 8.0, 300)]
    ).astype(np.float32)
    ours = np.asarray(expi(jnp.asarray(x)))
    theirs = sc.expi(x.astype(np.float64))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_registry_names():
    assert set(SDERegistry.get_all_names()) >= {"ouve", "bbed", "proposed_1"}


def _bbed_std_reference(t, k=2.6, theta=0.52):
    """Direct numpy/scipy port of the reference BBED._std (sgmse/sdes.py:287-293)."""
    logk = np.log(k)
    Eilog = sc.expi(-2 * logk)
    Eis = sc.expi(2 * (t - 1) * logk) - Eilog
    h = 2 * k**2 * logk
    var = (k ** (2 * t) - 1 + t) + h * (1 - t) * Eis
    var = var * (1 - t) * theta
    return np.sqrt(var)


def test_bbed_std_matches_scipy_formula():
    sde = BBED()
    t = np.linspace(0.03, 0.999, 64).astype(np.float32)
    ours = np.asarray(sde._std(jnp.asarray(t)))
    theirs = _bbed_std_reference(t.astype(np.float64))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)


def test_bbed_mean_is_linear_bridge(rng):
    sde = BBED()
    x0 = jnp.asarray((rng.standard_normal((2, 1, 8, 8)) + 1j * rng.standard_normal((2, 1, 8, 8))).astype(np.complex64))
    y = jnp.asarray((rng.standard_normal((2, 1, 8, 8)) + 1j * rng.standard_normal((2, 1, 8, 8))).astype(np.complex64))
    t = jnp.asarray([0.25, 0.75], dtype=jnp.float32)
    mean, _ = sde.marginal_prob(x0, t, y)
    expected = np.asarray(x0) * (1 - np.array([0.25, 0.75]))[:, None, None, None] + np.asarray(y) * np.array([0.25, 0.75])[:, None, None, None]
    np.testing.assert_allclose(np.asarray(mean), expected, atol=1e-6)


def test_ouve_std_closed_form():
    sde = OUVESDE()
    t = np.linspace(0.03, 1.0, 32).astype(np.float64)
    sigma_min, theta = sde.sigma_min, sde.theta
    logsig = np.log(sde.sigma_max / sde.sigma_min)
    expected = np.sqrt(
        (sigma_min**2 * np.exp(-2 * theta * t) * (np.exp(2 * (theta + logsig) * t) - 1) * logsig)
        / (theta + logsig)
    )
    ours = np.asarray(sde._std(jnp.asarray(t, dtype=jnp.float32)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_ouve_mean_interpolates(rng):
    sde = OUVESDE()
    x0 = jnp.asarray(rng.standard_normal((1, 1, 4, 4)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 1, 4, 4)).astype(np.float32))
    # t=0 -> x0
    m0, _ = sde.marginal_prob(x0, jnp.zeros((1,)), y)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(x0), atol=1e-6)
    # t->inf -> y
    m_inf, _ = sde.marginal_prob(x0, jnp.full((1,), 50.0), y)
    np.testing.assert_allclose(np.asarray(m_inf), np.asarray(y), atol=1e-4)


def test_proposed1_std_matches_reference_formula():
    sde = PROPOSED_1(sigma_min=1.0, sigma_max=2.6, theta=0.52)
    t = np.linspace(0.03, 0.99, 32)
    logsig = np.log(2.6)
    Eilog = sc.expi(-2 * logsig)
    Eis = sc.expi(2 * (t - 1) * logsig) - Eilog
    h = 2 * 2.6**2 * logsig
    var = (2.6 ** (2 * t) - 1 + t) + h * (1 - t) * Eis
    expected = np.sqrt(var * (1 - t) * 0.52)
    ours = np.asarray(sde._std(jnp.asarray(t, dtype=jnp.float32)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=1e-5)


def test_prior_sampling_statistics():
    """x_T = y + z*std(T), z ~ CN(0,1): component variance must be std^2/2."""
    sde = BBED()
    y = jnp.zeros((1, 1, 64, 64), dtype=jnp.complex64)
    x_T, z = sde.prior_sampling(jax.random.PRNGKey(0), y)
    std_T = float(sde._std(jnp.asarray([sde.T]))[0])
    emp = np.asarray(x_T)
    # E|x|^2 == std^2
    assert abs(np.mean(np.abs(emp) ** 2) - std_T**2) < 0.1 * std_T**2
    # real/imag each carry half the variance (torch complex randn convention)
    assert abs(np.var(emp.real) - std_T**2 / 2) < 0.1 * std_T**2


def test_discretize_and_reverse(rng):
    sde = BBED(N=30)
    x = jnp.asarray((rng.standard_normal((2, 1, 8, 8))).astype(np.float32)).astype(jnp.complex64)
    y = jnp.asarray((rng.standard_normal((2, 1, 8, 8))).astype(np.float32)).astype(jnp.complex64)
    t = jnp.asarray([0.5, 0.7])
    f, g = sde.discretize(x, t, y, 0.0333)
    assert f.shape == x.shape and g.shape == (2,)

    # reverse drift = forward drift - g^2 * score
    score = lambda x_, t_, y_: -x_
    rsde = sde.reverse(score)
    rf, rg = rsde.discretize(x, t, y, 0.0333)
    expected_rf = np.asarray(f) - (np.asarray(g)[:, None, None, None] ** 2) * (-np.asarray(x))
    np.testing.assert_allclose(np.asarray(rf), expected_rf, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rg), np.asarray(g))

    # probability-flow: half score weight, zero diffusion
    rsde_pf = sde.reverse(score, probability_flow=True)
    rf_pf, rg_pf = rsde_pf.discretize(x, t, y, 0.0333)
    np.testing.assert_allclose(np.asarray(rg_pf), 0.0)
    expected_pf = np.asarray(f) - 0.5 * (np.asarray(g)[:, None, None, None] ** 2) * (-np.asarray(x))
    np.testing.assert_allclose(np.asarray(rf_pf), expected_pf, rtol=1e-5)


def test_replace_for_eval_time_T():
    """eval.py:105-113 mutates sde.T; we use dataclasses.replace."""
    sde = BBED()
    sde2 = sde.replace(T_sampling=0.5, N=15)
    assert sde2.T == 0.5 and sde2.N == 15 and sde.T == 0.999
