"""ScoreModel tests: every (snr_conditioned x model_type) loss branch, the
forward parameterizations, constants, and the karras grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.models.score_model import (
    ScoreModel,
    ScoreModelConfig,
    calculate_normfac_direct,
    calculate_snr_direct,
    karras_t,
    noise_mag,
    t_30,
)

TINY_BACKBONE = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
                     image_size=16)


def _make_model(**cfg_overrides):
    defaults = dict(backbone="ncsnpp", sde="bbed", sigma_max=0.5)
    defaults.update(cfg_overrides)
    cfg = ScoreModelConfig(**defaults)
    sde_kwargs = {}
    if cfg.sde == "ouve":
        sde_kwargs = dict(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=30)
    elif cfg.sde == "bbed":
        sde_kwargs = dict(T_sampling=0.999, k=2.6, theta=0.52, N=30)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE, sde_kwargs=sde_kwargs)
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=16, num_freq_bins=16)
    return model, variables


def _spec_batch(key, b=2, f=16, t=16):
    k1, k2 = jax.random.split(key)
    x = (jax.random.normal(k1, (b, 1, f, t)) + 1j * jax.random.normal(k1, (b, 1, f, t)))
    y = x + 0.3 * (jax.random.normal(k2, (b, 1, f, t)) + 1j * jax.random.normal(k2, (b, 1, f, t)))
    return x.astype(jnp.complex64), y.astype(jnp.complex64)


def test_t30_grid_matches_reference_formula():
    """Karras rho=7 grid (model.py:22-23)."""
    i = np.arange(1, 31)
    expected = (0.001 ** (1 / 7) + (i - 1) / 29 * (1 - 0.001 ** (1 / 7))) ** 7
    np.testing.assert_allclose(t_30, expected)
    np.testing.assert_allclose(t_30[-1], 1.0)
    np.testing.assert_allclose(t_30[0], 0.001)
    np.testing.assert_allclose(np.asarray(karras_t(np.arange(1, 31))), expected)


def test_snr_and_normfac_constants():
    """calculate_snr_direct / calculate_normfac_direct (inference.py:76-83)."""
    np.testing.assert_allclose(
        calculate_snr_direct(1.0, 0.56234, 0.56234), 0.56234 / (10**0.25 * 0.56234)
    )
    v = calculate_normfac_direct(1.0, 1.0, 1.0)
    np.testing.assert_allclose(v, 2.040166 * (0.240253 + 0.759747) ** 0.5 / 2**0.5, rtol=1e-6)


@pytest.mark.parametrize(
    "snr_conditioned,model_type,sde",
    [
        ("false", "bbed", "bbed"),
        ("false", "sebridge", "bbed"),
        ("false", "sebridge_v2", "bbed"),
        ("fixed", "sebridge_v2", "bbed"),
        ("fixed", "sebridge_v3", "bbed"),
        ("true", "sebridge_v2", "bbed"),
        ("true", "sebridge_v3", "bbed"),
    ],
)
def test_all_loss_branches_finite_and_positive(snr_conditioned, model_type, sde):
    model, variables = _make_model(
        snr_conditioned=snr_conditioned, model_type=model_type, sde=sde,
        fixed_snr=0.17783,
    )
    x, y = _spec_batch(jax.random.PRNGKey(3))
    loss, updates = jax.jit(
        lambda v, b, k: model.loss_fn(v, b, k, train=True)
    )(variables, (x, y), jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    assert float(loss) >= 0


def test_sqrt_mse_loss_branch():
    model, variables = _make_model(
        snr_conditioned="false", model_type="sebridge_v2", loss_type="sqrt_mse"
    )
    x, y = _spec_batch(jax.random.PRNGKey(3))
    loss, _ = model.loss_fn(variables, (x, y), jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))


def test_bbed_loss_is_dsm():
    """For the bbed branch, loss = mean 0.5*sum |sigma*score+z|^2; with the true
    score (score = -z/sigma), loss would be 0 — check the loss formula by
    substituting a fake backbone through forward: use score from the model and
    verify against a manual recomputation with the same rng."""
    model, variables = _make_model(snr_conditioned="false", model_type="bbed")
    x, y = _spec_batch(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    loss, _ = model.loss_fn(variables, (x, y), key, train=False)

    # manual recomputation
    kt, kz = jax.random.split(key)
    b = x.shape[0]
    rdm = jax.random.uniform(kt, (b,)) * (model.sde.T - model.cfg.t_eps) + model.cfg.t_eps
    t = jnp.minimum(rdm, model.sde.T)
    mean, std = model.sde.marginal_prob(x, t, y)
    from diffse_tpu.utils import randn_like

    z = randn_like(kz, x)
    sigmas = std[:, None, None, None].astype(x.dtype)
    perturbed = mean + sigmas * z
    score, _ = model.forward(variables, perturbed, t, y)
    err = sigmas * score + z
    expected = jnp.mean(0.5 * jnp.sum(jnp.square(jnp.abs(err)).reshape(b, -1), axis=-1))
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)


def test_forward_consistency_parameterization_at_eps():
    """At t = eps = 0.001, c_skip = 1 and c_out = 0, so f_theta(x) == x —
    the consistency-model boundary condition."""
    model, variables = _make_model(snr_conditioned="false", model_type="sebridge_v2")
    x, y = _spec_batch(jax.random.PRNGKey(5))
    t = jnp.full((x.shape[0],), 0.001)
    out, _ = model.forward(variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_forward_bbed_is_negated_dnn():
    model, variables = _make_model(snr_conditioned="false", model_type="bbed")
    x, y = _spec_batch(jax.random.PRNGKey(5))
    t = jnp.full((x.shape[0],), 0.5)
    out, _ = model.forward(variables, x, t, y)
    dnn_input = jnp.concatenate([x, y], axis=1)
    raw = model.backbone.apply(variables, dnn_input, t)
    np.testing.assert_allclose(np.asarray(out), -np.asarray(raw), atol=1e-6)


def test_noise_mag():
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[0.0, 0.0]])
    np.testing.assert_allclose(float(noise_mag(a, b, "max")), 2.0)
    np.testing.assert_allclose(float(noise_mag(a, b, "mean")), 1.5)


def test_bbve_alias_remaps_to_bbed():
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbve", model_type="bbed",
                           sigma_max=1.0)
    model = ScoreModel(
        cfg, backbone_kwargs=TINY_BACKBONE,
        sde_kwargs=dict(T_sampling=0.999, sigma_max=1.0, sigma_min=0.05,
                        theta=0.52, N=30),
    )
    from diffse_tpu.sde import BBED

    assert isinstance(model.sde, BBED)
    assert model.sde.k == 1.0  # k took sigma_max's value


def test_fixed_enhance_raises():
    model, variables = _make_model(snr_conditioned="fixed", model_type="sebridge_v3")
    with pytest.raises(NotImplementedError):
        model.enhance(variables, jnp.zeros((1, 2048)), jnp.zeros((1, 2048)))


def test_get_pc_sampler_minibatch():
    """minibatch sampling splits the conditioner batch (model.py:560-572)."""
    model, variables = _make_model(snr_conditioned="false", model_type="bbed")
    x, y = _spec_batch(jax.random.PRNGKey(8), b=5)
    sampler = model.get_pc_sampler("reverse_diffusion", "ald", variables, y,
                                   N=3, minibatch=2, snr=0.5)
    samples, ns = sampler(jax.random.PRNGKey(9))
    assert samples.shape == y.shape
    assert len(ns) == 3  # ceil(5/2) chunks
    assert np.all(np.isfinite(np.asarray(samples.real)))


@pytest.mark.slow
def test_enhance_snr_sweep_reuses_one_compile():
    """Corrector snr is a traced scalar of the enhance jit: sweeping snr must
    not grow the compile cache, and must change the output (VERDICT r1 #9)."""
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5,
    )
    backbone = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                    attn_resolutions=(16,), image_size=256)
    model = ScoreModel(
        cfg, backbone_kwargs=backbone,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.1)
    x = y

    out = {}
    for snr in (0.3, 0.8):
        out[snr] = model.enhance(
            variables, x, y, key=jax.random.PRNGKey(1), N=3, snr=snr,
        )
    assert len(model._enhance_cache) == 1, (
        f"snr sweep must reuse one compile, cache={list(model._enhance_cache)}"
    )
    assert not np.allclose(out[0.3], out[0.8]), (
        "different corrector snr must change the enhanced output"
    )


@pytest.mark.slow
def test_enhance_length_variation_reuses_one_compile():
    """Different utterance lengths in the same 64-frame bucket must share ONE
    compiled program: enhance() zero-pads waveforms to the bucket's sample
    count on the host, so the jit never sees a raw per-utterance shape (a
    fresh 65M-param compile per length would make full-set eval
    compile-bound on TPU)."""
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5,
    )
    backbone = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                    attn_resolutions=(16,), image_size=256)
    model = ScoreModel(
        cfg, backbone_kwargs=backbone,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)

    rng = np.random.default_rng(0)
    outs = {}
    # 2048 and 5000 samples both land in the 64-frame bucket
    for n in (2048, 5000):
        y = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1)
        outs[n] = model.enhance(variables, y, y, key=jax.random.PRNGKey(1), N=3)
        assert outs[n].shape == (n,)
    assert len(model._enhance_cache) == 1
    jitted = next(iter(model._enhance_cache.values()))
    assert jitted._cache_size() == 1, (
        f"same bucket must not retrace per length, traces={jitted._cache_size()}"
    )


def test_enhance_timestep_type_logit():
    """enhance(timestep_type=...) threads the sampler grid through the jit
    cache: a logit-grid run compiles a separate program, changes the output
    (different t schedule), and stays finite."""
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5,
    )
    backbone = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                    attn_resolutions=(16,), image_size=256)
    model = ScoreModel(
        cfg, backbone_kwargs=backbone,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.1)

    out_lin = model.enhance(variables, y, y, key=jax.random.PRNGKey(1), N=4)
    out_logit = model.enhance(variables, y, y, key=jax.random.PRNGKey(1), N=4,
                              timestep_type="logit")
    assert len(model._enhance_cache) == 2
    assert np.all(np.isfinite(out_logit))
    assert not np.allclose(out_lin, out_logit)
