"""White-box parity tests of the consistency-bridge construction inside
ScoreModel.loss_fn: capture the (x_t, t, mu_t) fed to the network and verify
them against the reference formulas (model.py:159-394) recomputed manually."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig, karras_t
from diffse_tpu.transforms import SpecTransformConfig, spec_back, spec_fwd
from diffse_tpu.utils import randn_like

TINY_BACKBONE = dict(nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
                     image_size=16)


class _Capture:
    """Wraps model.forward to record its inputs and return zeros."""

    def __init__(self, model):
        self.model = model
        self.calls = []

    def __call__(self, variables, x, t, y, s=None, train=False):
        self.calls.append((x, t, y))
        return jnp.zeros_like(x), {}


def _make(snr_conditioned, model_type, transform_type="exponent"):
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type=model_type,
        snr_conditioned=snr_conditioned, fixed_snr=0.17783, sigma_max=1.0,
        transform_type=transform_type,
    )
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    return model


def _batch(key, b=3):
    k1, k2 = jax.random.split(key)
    x = (jax.random.normal(k1, (b, 1, 16, 16)) + 1j * jax.random.normal(k1, (b, 1, 16, 16))).astype(jnp.complex64)
    y = x + 0.3 * (jax.random.normal(k2, (b, 1, 16, 16)) + 1j * jax.random.normal(k2, (b, 1, 16, 16))).astype(jnp.complex64)
    return x, y


def _expected_karras_pair(key, b, T):
    kt, kz = jax.random.split(key)
    n = jax.random.randint(kt, (b,), 1, 30).astype(jnp.float32)
    tn = karras_t(n, T=T)
    tn1 = karras_t(n + 1, T=T)
    return tn, tn1, kz


def test_true_sebridge_v3_bridge_formula():
    """mu_t = spec_fwd(spec_back(x)(1-t) + spec_back(y) t); x_t = mu_t + t z
    (model.py:361-390, paper Eq. 6)."""
    model = _make("true", "sebridge_v3")
    cap = _Capture(model)
    model.forward = cap
    x, y = _batch(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    model.loss_fn(None, (x, y), key)

    tn, tn1, kz = _expected_karras_pair(key, x.shape[0], T=1.0)
    z = randn_like(kz, x) * model.cfg.sigma_max
    scfg = model.spec_cfg

    bb = lambda a: spec_back(a, scfg)
    ff = lambda a: spec_fwd(a, scfg)
    t_b = tn[:, None, None, None]
    t1_b = tn1[:, None, None, None]
    mu_tn = ff(bb(x) * (1 - t_b) + bb(y) * t_b)
    mu_tn1 = ff(bb(x) * (1 - t1_b) + bb(y) * t1_b)

    (x_t1, t1, mu1), (x_t0, t0, mu0) = cap.calls
    np.testing.assert_allclose(np.asarray(t1), np.asarray(tn1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(tn), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu_tn1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu0), np.asarray(mu_tn), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_t1), np.asarray(mu_tn1 + t1_b * z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_t0), np.asarray(mu_tn + t_b * z), atol=1e-5)


def test_true_sebridge_v3_none_transform_is_linear_bridge():
    """With transform_type='none', the nonlinear bridge degenerates to the
    linear interpolation y*t + x*(1-t)."""
    model = _make("true", "sebridge_v3", transform_type="none")
    cap = _Capture(model)
    model.forward = cap
    x, y = _batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(3)
    model.loss_fn(None, (x, y), key)

    tn, tn1, _ = _expected_karras_pair(key, x.shape[0], T=1.0)
    t1_b = tn1[:, None, None, None]
    (x_t1, _t1, mu1), _ = cap.calls
    np.testing.assert_allclose(
        np.asarray(mu1), np.asarray(x * (1 - t1_b) + y * t1_b), atol=1e-5
    )


def test_fixed_sebridge_v3_rescales_noise():
    """y0_snr = (spec_back(y) - spec_back(x)) * fixed_snr before the bridge
    (model.py:293-326)."""
    model = _make("fixed", "sebridge_v3")
    cap = _Capture(model)
    model.forward = cap
    x, y = _batch(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(11)
    model.loss_fn(None, (x, y), key)

    tn, tn1, _ = _expectation = _expected_karras_pair(key, x.shape[0], T=1.0)
    scfg = model.spec_cfg
    x_ori = spec_back(x, scfg)
    y0_snr = (spec_back(y, scfg) - x_ori) * model.cfg.fixed_snr
    t1_b = tn1[:, None, None, None]
    mu_tn1 = spec_fwd(x_ori + y0_snr * t1_b, scfg)
    (x_t1, _t1, mu1), _ = cap.calls
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu_tn1), atol=1e-5)


def test_false_sebridge_sqrt_t_noise():
    """x_t = y t + x (1-t) + sqrt(t(1-t)) z with T=0.999 (model.py:192-221)."""
    model = _make("false", "sebridge")
    cap = _Capture(model)
    model.forward = cap
    x, y = _batch(jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(13)
    model.loss_fn(None, (x, y), key)

    tn, tn1, kz = _expected_karras_pair(key, x.shape[0], T=0.999)
    z = randn_like(kz, x) * model.cfg.sigma_max
    t1_b = tn1[:, None, None, None]
    expected = y * t1_b + x * (1 - t1_b) + ((t1_b * (1 - t1_b)) ** 0.5) * z
    (x_t1, _t1, cond1), _ = cap.calls
    np.testing.assert_allclose(np.asarray(x_t1), np.asarray(expected), atol=1e-5)
    # conditioned on y (not mu) in this branch
    np.testing.assert_allclose(np.asarray(cond1), np.asarray(y), atol=1e-6)


def test_false_bbed_perturbation_matches_marginal():
    """perturbed = mean + std z with (mean, std) from BBED.marginal_prob."""
    model = _make("false", "bbed")
    cap = _Capture(model)
    model.forward = cap
    x, y = _batch(jax.random.PRNGKey(5))
    key = jax.random.PRNGKey(17)
    model.loss_fn(None, (x, y), key)

    kt, kz = jax.random.split(key)
    b = x.shape[0]
    rdm = jax.random.uniform(kt, (b,)) * (model.sde.T - model.cfg.t_eps) + model.cfg.t_eps
    t = jnp.minimum(rdm, model.sde.T)
    mean, std = model.sde.marginal_prob(x, t, y)
    z = randn_like(kz, x)
    expected = mean + std[:, None, None, None].astype(x.dtype) * z
    (perturbed, t_seen, cond), = cap.calls
    np.testing.assert_allclose(np.asarray(t_seen), np.asarray(t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(perturbed), np.asarray(expected), atol=1e-5)
