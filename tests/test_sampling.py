"""Sampler tests: PC sampler on a toy problem with a known ground-truth score,
scan-vs-python-loop equivalence, and RK45 vs scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.sde import BBED, OUVESDE
from diffse_tpu.sampling import get_pc_sampler, get_ode_sampler, timesteps_space
from diffse_tpu.sampling.ode import solve_ivp_rk45


def _make_problem(key, shape=(2, 1, 16, 16)):
    kx, ky = jax.random.split(key)
    x0 = (jax.random.normal(kx, shape) + 1j * jax.random.normal(kx, shape)).astype(jnp.complex64)
    y = x0 + 0.3 * (jax.random.normal(ky, shape) + 1j * jax.random.normal(ky, shape)).astype(jnp.complex64)
    return x0, y


def _true_score(sde, x0):
    """Score of p_t(x | x0, y) = N(mean(x0,t,y), std(t)^2) for known x0."""

    def score(x, t, y):
        mean, std = sde.marginal_prob(x0, t, y)
        return -(x - mean) / (std[:, None, None, None] ** 2).astype(x.dtype)

    return score


def test_pc_sampler_recovers_x0_bbed():
    """With the exact score, 30 PC steps from the prior must land near x0."""
    key = jax.random.PRNGKey(42)
    x0, y = _make_problem(key)
    sde = BBED(N=30)
    sampler = get_pc_sampler(
        "reverse_diffusion", "ald", sde, _true_score(sde, x0), Y=y, denoise=True,
        eps=0.03, snr=0.5, corrector_steps=1,
    )
    sample, ns = jax.jit(sampler)(jax.random.PRNGKey(1))
    assert ns == 60  # 30 * (1 corrector + 1 predictor)
    err = float(jnp.linalg.norm(sample - x0) / jnp.linalg.norm(x0))
    assert err < 0.15, f"relative error {err}"


def test_pc_sampler_recovers_x0_ouve():
    key = jax.random.PRNGKey(7)
    x0, y = _make_problem(key)
    sde = OUVESDE(N=30)
    sampler = get_pc_sampler(
        "reverse_diffusion", "ald", sde, _true_score(sde, x0), Y=y, denoise=True,
        eps=0.03, snr=0.5,
    )
    sample, _ = jax.jit(sampler)(jax.random.PRNGKey(2))
    err = float(jnp.linalg.norm(sample - x0) / jnp.linalg.norm(x0))
    assert err < 0.2, f"relative error {err}"


def test_timesteps_space_linear():
    ts = timesteps_space(0.999, 30, 0.03)
    assert len(ts) == 30
    np.testing.assert_allclose(ts[0], 0.999, rtol=1e-6)
    np.testing.assert_allclose(ts[-1], 0.03, rtol=1e-6)
    diffs = np.diff(ts)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)


def test_none_predictor_corrector_identity():
    key = jax.random.PRNGKey(0)
    x0, y = _make_problem(key)
    sde = BBED(N=5)
    sampler = get_pc_sampler("none", "none", sde, _true_score(sde, x0), Y=y, denoise=False)
    sample, ns = sampler(jax.random.PRNGKey(3))
    assert ns == 5
    # with no updates the sample equals the prior draw; just check shape/finite
    assert sample.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(sample.real)))


def test_euler_maruyama_runs():
    key = jax.random.PRNGKey(0)
    x0, y = _make_problem(key)
    sde = OUVESDE(N=20)
    sampler = get_pc_sampler("euler_maruyama", "none", sde, _true_score(sde, x0), Y=y)
    sample, _ = jax.jit(sampler)(jax.random.PRNGKey(4))
    assert bool(jnp.all(jnp.isfinite(sample.real)))


def test_rk45_vs_scipy_linear_system():
    """dy/dt = A y against scipy.integrate.solve_ivp."""
    import scipy.integrate

    A = np.array([[-0.5, 0.3], [-0.2, -0.8]], dtype=np.float32)
    y0 = np.array([1.0, -2.0], dtype=np.float32)

    def f_jax(t, y):
        return jnp.asarray(A) @ y

    res = solve_ivp_rk45(f_jax, (0.0, 3.0), jnp.asarray(y0), rtol=1e-6, atol=1e-8)
    ref = scipy.integrate.solve_ivp(
        lambda t, y: A @ y, (0.0, 3.0), y0, rtol=1e-6, atol=1e-8, method="RK45"
    )
    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(res.y), ref.y[:, -1], rtol=1e-4, atol=1e-6)


def test_rk45_backward_integration():
    """Integrating backwards (T -> eps), the BBED/ODE use case."""
    import scipy.integrate

    def f_jax(t, y):
        return -2.0 * t * y

    y0 = jnp.asarray([3.0])
    res = solve_ivp_rk45(f_jax, (1.0, 0.1), y0, rtol=1e-6, atol=1e-8)
    exact = 3.0 * np.exp(-(0.1**2 - 1.0**2))
    np.testing.assert_allclose(np.asarray(res.y)[0], exact, rtol=1e-4)


def test_rk45_complex_state():
    def f_jax(t, y):
        return 1j * y  # rotation: |y| preserved

    y0 = jnp.asarray([1.0 + 0.0j], dtype=jnp.complex64)
    res = solve_ivp_rk45(f_jax, (0.0, np.pi), y0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.y)[0], np.exp(1j * np.pi), atol=1e-4)


def test_ode_sampler_recovers_x0():
    key = jax.random.PRNGKey(11)
    x0, y = _make_problem(key, shape=(1, 1, 8, 8))
    sde = BBED(N=30)
    sampler = get_ode_sampler(sde, _true_score(sde, x0), y=y, eps=0.03)
    sample, nfev = jax.jit(sampler)(jax.random.PRNGKey(5))
    err = float(jnp.linalg.norm(sample - x0) / jnp.linalg.norm(x0))
    assert err < 0.2, f"relative error {err}, nfev {int(nfev)}"


def test_scan_sampler_matches_python_loop():
    """The counter-based closed-form scan schedule must match an explicit
    python loop over timesteps_space with stepsize t_i - t_{i+1} (the
    reference's loop, sampling/__init__.py:54-75), step for step."""
    from diffse_tpu.sampling.correctors import AnnealedLangevinDynamics
    from diffse_tpu.sampling.predictors import ReverseDiffusionPredictor

    key = jax.random.PRNGKey(21)
    x0, y = _make_problem(key, shape=(1, 1, 8, 8))
    sde = BBED(N=12)
    score = _true_score(sde, x0)
    eps, snr_v = 0.03, 0.5

    sampler = get_pc_sampler("reverse_diffusion", "ald", sde, score, Y=y,
                             denoise=True, eps=eps, snr=snr_v, corrector_steps=1)
    sample_key = jax.random.PRNGKey(99)
    scan_out, _ = sampler(sample_key)

    # python-loop replication with identical key-splitting structure
    predictor = ReverseDiffusionPredictor(sde, score)
    corrector = AnnealedLangevinDynamics(sde, score, snr=snr_v, n_steps=1)
    prior_key, scan_key = jax.random.split(sample_key)
    xt, _ = sde.prior_sampling(prior_key, y)
    ts = timesteps_space(sde.T, sde.N, eps)
    k = scan_key
    x_mean = xt
    for i, t in enumerate(ts):
        stepsize = ts[i] - ts[i + 1] if i < len(ts) - 1 else ts[-1]
        k, kc, kp = jax.random.split(k, 3)
        vec_t = jnp.full((1,), float(t))
        xt, x_mean = corrector.update_fn(kc, xt, vec_t, y)
        xt, x_mean = predictor.update_fn(kp, xt, vec_t, y, float(stepsize))

    # the closed-form schedule computes t_i = T - i*delta in f32 while
    # linspace rounds differently (~1e-7 per step); after 12 steps the
    # trajectories agree to ~1e-4
    np.testing.assert_allclose(np.asarray(scan_out), np.asarray(x_mean),
                               rtol=2e-3, atol=2e-4)


def test_pc_sampler_intermediate_trajectory():
    """intermediate=True returns the full per-step trajectory; its last entry
    equals the non-intermediate sample for the same key. (The reference gates
    on this flag but returns an undefined name, sampling/__init__.py:77-78 —
    this is the working equivalent.)"""
    key = jax.random.PRNGKey(3)
    x0, y = _make_problem(key, shape=(2, 1, 8, 8))
    sde = BBED(N=7)
    kwargs = dict(sde=sde, score_fn=_true_score(sde, x0), Y=y, denoise=True,
                  eps=0.03, snr=0.5, corrector_steps=1)
    sampler = get_pc_sampler("reverse_diffusion", "ald", **kwargs)
    sampler_i = get_pc_sampler("reverse_diffusion", "ald", intermediate=True,
                               **kwargs)
    sample_key = jax.random.PRNGKey(17)
    sample, ns = jax.jit(sampler)(sample_key)
    traj, ns_i = jax.jit(sampler_i)(sample_key)
    assert ns_i == ns == 7 * 2
    assert traj.shape == (7,) + y.shape
    # the production sampler peels the final step out of the scan; the
    # different program structure changes XLA fusion/FMA rounding at the
    # f32-epsilon level, so equality is to tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(sample),
                               rtol=1e-5, atol=1e-4)
    # the trajectory should move: early steps differ from the final sample
    assert not np.allclose(np.asarray(traj[0]), np.asarray(traj[-1]))


def test_pc_sampler_snr_is_traceable():
    """One jitted program must serve multiple corrector snr values (snr is a
    traced scalar, not a compile-time constant)."""
    key = jax.random.PRNGKey(9)
    x0, y = _make_problem(key, shape=(1, 1, 8, 8))
    sde = BBED(N=5)
    score = _true_score(sde, x0)

    traces = {"n": 0}

    @jax.jit
    def run(snr_value, sample_key):
        traces["n"] += 1
        sampler = get_pc_sampler("reverse_diffusion", "ald", sde, score, Y=y,
                                 denoise=True, eps=0.03, snr=snr_value)
        return sampler(sample_key)[0]

    k = jax.random.PRNGKey(4)
    a = run(jnp.asarray(0.3), k)
    b = run(jnp.asarray(0.8), k)
    assert traces["n"] == 1, "snr change must not retrace/recompile"
    assert not np.allclose(np.asarray(a), np.asarray(b)), (
        "different corrector snr must change the sample"
    )


def test_ode_sampler_drift_matches_scipy():
    """Integrate the actual reverse probability-flow ODE drift with scipy's
    RK45 and compare against the on-device sampler's pre-denoise state (the
    reference's sampler is literally scipy, sampling/__init__.py:95-171)."""
    import scipy.integrate

    key = jax.random.PRNGKey(23)
    x0, y = _make_problem(key, shape=(1, 1, 4, 4))
    sde = BBED(N=30)
    score = _true_score(sde, x0)
    rsde = sde.reverse(score, probability_flow=True)
    eps = 0.03

    sampler = get_ode_sampler(sde, score, y=y, eps=eps, denoise=False,
                              rtol=1e-6, atol=1e-8)
    sample_key = jax.random.PRNGKey(31)
    ours, nfev = sampler(sample_key)

    # identical prior draw, then scipy integrates the same drift
    prior_key, _ = jax.random.split(sample_key)
    xt, _ = sde.prior_sampling(prior_key, y)
    shape, dtype = xt.shape, np.asarray(xt).dtype

    def f(t, flat):
        x = jnp.asarray(flat.reshape(shape).astype(dtype))
        vec_t = jnp.full((shape[0],), float(t), dtype=jnp.float32)
        return np.asarray(rsde.sde(x, vec_t, y)[0]).reshape(-1)

    ref = scipy.integrate.solve_ivp(
        f, (float(sde.T), eps), np.asarray(xt).reshape(-1),
        rtol=1e-6, atol=1e-8, method="RK45",
    )
    assert ref.success
    np.testing.assert_allclose(
        np.asarray(ours).reshape(-1), ref.y[:, -1].astype(dtype),
        rtol=5e-3, atol=5e-4,
    )
    # comparable work: adaptive step counts should be in the same ballpark
    assert 0.5 <= float(nfev) / ref.nfev <= 2.0, (int(nfev), ref.nfev)


def test_sampler_deterministic_given_key():
    key = jax.random.PRNGKey(0)
    x0, y = _make_problem(key)
    sde = BBED(N=10)
    sampler = get_pc_sampler("reverse_diffusion", "ald", sde, _true_score(sde, x0),
                             Y=y, eps=0.03, snr=0.5)
    a, _ = sampler(jax.random.PRNGKey(5))
    b, _ = sampler(jax.random.PRNGKey(5))
    c, _ = sampler(jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_pc_sampler_unroll_matches():
    """scan unroll must not change results (same per-step keys/math)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.sampling import get_pc_sampler
    from diffse_tpu.sde import SDERegistry

    sde = SDERegistry.get_by_name("bbed")(T_sampling=0.999, k=2.6, theta=0.52,
                                          N=6)
    rng = np.random.default_rng(0)
    y = jnp.asarray((rng.standard_normal((2, 1, 8, 8))
                     + 1j * rng.standard_normal((2, 1, 8, 8))).astype(np.complex64))
    score = lambda x, t, y_: -x / (1.0 + t[:, None, None, None])

    s1 = get_pc_sampler("reverse_diffusion", "ald", sde=sde, score_fn=score,
                        Y=y, denoise=True, eps=0.03, snr=0.5,
                        corrector_steps=1, unroll=1)
    s2 = get_pc_sampler("reverse_diffusion", "ald", sde=sde, score_fn=score,
                        Y=y, denoise=True, eps=0.03, snr=0.5,
                        corrector_steps=1, unroll=2)
    a, _ = jax.jit(s1)(jax.random.PRNGKey(3))
    b, _ = jax.jit(s2)(jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pc_sampler_peeled_matches_unpeeled():
    """The peeled-final-step production sampler (denoise=True default) must be
    bit-identical to the legacy all-in-scan form: the key-split structure is
    unchanged and the skipped final noise draw feeds nothing."""
    import numpy as np

    from diffse_tpu.sde import SDERegistry

    sde = SDERegistry.get_by_name("bbed")(T_sampling=0.999, k=2.6, theta=0.52, N=7)

    def score_fn(x, t, y):
        return -(x - y) * (1.0 + t[:, None, None, None]).astype(x.dtype)

    rng = np.random.default_rng(0)
    y = jnp.asarray((rng.standard_normal((2, 1, 8, 8))
                     + 1j * rng.standard_normal((2, 1, 8, 8))).astype(np.complex64))
    key = jax.random.PRNGKey(5)
    for n in (1, 2, 7):
        s = sde.replace(N=n)
        peeled = get_pc_sampler("reverse_diffusion", "ald", sde=s,
                                score_fn=score_fn, Y=y, denoise=True,
                                eps=0.03, snr=0.5, corrector_steps=1,
                                peel_last=True)
        legacy = get_pc_sampler("reverse_diffusion", "ald", sde=s,
                                score_fn=score_fn, Y=y, denoise=True,
                                eps=0.03, snr=0.5, corrector_steps=1,
                                peel_last=False)
        a, na = jax.jit(peeled)(key)
        b, nb = jax.jit(legacy)(key)
        assert na == nb
        # identical math; XLA fuses the peeled structure differently, so
        # agreement is at f32 rounding level rather than bitwise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_heun_predictor_is_second_order():
    """HeunPredictor integrates the probability-flow ODE with O(h^2) error.

    With the exact point-mass score, the flow is affine and has the closed
    form x(t) = mean(t) + std(t)/std(T) * (x_T - mean(T)) (the probability
    flow transports quantiles of the Gaussian marginals). Halving the step
    must cut Heun's error ~4x (vs ~2x for a first-order Euler baseline), and
    Heun at N steps must beat Euler at 2N.
    """
    from diffse_tpu.sampling.predictors import PredictorRegistry

    key = jax.random.PRNGKey(3)
    x0, y = _make_problem(key, shape=(2, 1, 8, 8))
    sde = OUVESDE(N=30)
    score = _true_score(sde, x0)
    heun = PredictorRegistry.get_by_name("heun")(sde, score)
    rsde = sde.reverse(score, probability_flow=True)

    T, eps = sde.T, 0.1
    B = x0.shape[0]
    vec = lambda t: jnp.full((B,), t, jnp.float32)
    mT, sT = sde.marginal_prob(x0, vec(T), y)
    me, se = sde.marginal_prob(x0, vec(eps), y)
    z = (jax.random.normal(jax.random.PRNGKey(7), x0.shape)
         + 1j * jax.random.normal(jax.random.PRNGKey(8), x0.shape)).astype(jnp.complex64)
    x_T = mT + sT[:, None, None, None] * z
    x_exact = me + (se / sT)[:, None, None, None] * (x_T - mT)

    def run(step_fn, n):
        ts = np.linspace(T, eps, n + 1)
        x = x_T
        for i in range(n):
            x = step_fn(x, vec(float(ts[i])), float(ts[i] - ts[i + 1]))
        return x

    def heun_step(x, t, h):
        return heun.update_fn(jax.random.PRNGKey(0), x, t, y, h)[0]

    def euler_step(x, t, h):  # first-order baseline on the same ODE
        d, _ = rsde.sde(x, t, y)
        return x - h * d

    err = lambda x: float(jnp.linalg.norm(x - x_exact))
    e_h = {n: err(run(heun_step, n)) for n in (8, 16, 32)}
    e_e = {n: err(run(euler_step, n)) for n in (16, 32)}

    assert e_h[8] / e_h[16] > 3.0, f"not 2nd order: {e_h}"
    assert e_h[16] / e_h[32] > 3.0, f"not 2nd order: {e_h}"
    assert 1.5 < e_e[16] / e_e[32] < 3.0, f"Euler baseline not 1st order: {e_e}"
    # matched NFE: Heun at N/2 (same score evals as Euler at N) is more accurate
    assert e_h[8] < e_e[16]
    assert e_h[16] < e_e[32]


def test_pc_sampler_heun_recovers_x0():
    """Product path: the PC sampler with the heun predictor (corrector none)
    recovers x0 from the exact score, and counts 2 NFE per step."""
    key = jax.random.PRNGKey(42)
    x0, y = _make_problem(key)
    sde = BBED(N=15)
    sampler = get_pc_sampler(
        "heun", "none", sde, _true_score(sde, x0), Y=y, denoise=False, eps=0.03,
    )
    sample, ns = jax.jit(sampler)(jax.random.PRNGKey(1))
    assert ns == 30  # 15 steps x 2 score evals
    rel = float(jnp.linalg.norm(sample - x0) / jnp.linalg.norm(x0))
    assert rel < 0.15, f"heun sampler missed x0: rel={rel}"


def test_timesteps_space_bridge_geom():
    """Geometric-in-(1-t) grid: correct endpoints, monotone decreasing,
    constant ratio in (1-t)."""
    ts = timesteps_space(0.999, 30, 0.03, "bridge_geom")
    assert len(ts) == 30
    np.testing.assert_allclose(ts[0], 0.999, rtol=1e-6)
    np.testing.assert_allclose(ts[-1], 0.03, rtol=1e-5)
    assert np.all(np.diff(ts) < 0)
    ratios = (1.0 - ts[1:]) / (1.0 - ts[:-1])
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)
    # steps cluster at the singular end: first step << linear step
    assert (ts[0] - ts[1]) < (0.999 - 0.03) / 29 / 10


def test_timesteps_space_logit():
    """Logit grid: correct endpoints, monotone, uniform in log(t/(1-t)),
    clustering at BOTH ends relative to the interior."""
    ts = timesteps_space(0.999, 30, 0.03, "logit")
    assert len(ts) == 30
    np.testing.assert_allclose(ts[0], 0.999, rtol=1e-6)
    np.testing.assert_allclose(ts[-1], 0.03, rtol=1e-5)
    assert np.all(np.diff(ts) < 0)
    u = np.log(ts.astype(np.float64) / (1.0 - ts.astype(np.float64)))
    du = np.diff(u)
    np.testing.assert_allclose(du, du[0], rtol=1e-3)
    steps = -np.diff(ts)
    assert steps[0] < steps.max() / 10        # clustered at t -> 1
    assert steps[-1] < steps.max() / 2        # and tighter again at t -> eps
    with pytest.raises(ValueError):
        timesteps_space(0.999, 1, 0.03, "logit")


@pytest.mark.parametrize("grid", ["bridge_geom", "logit"])
def test_scan_sampler_matches_python_loop_alt_grids(grid):
    """The counter-based closed-form schedule for the alternative grids must
    match an explicit python loop over timesteps_space, step for step."""
    from diffse_tpu.sampling.correctors import AnnealedLangevinDynamics
    from diffse_tpu.sampling.predictors import ReverseDiffusionPredictor

    key = jax.random.PRNGKey(21)
    x0, y = _make_problem(key, shape=(1, 1, 8, 8))
    sde = BBED(N=12)
    score = _true_score(sde, x0)
    eps, snr_v = 0.03, 0.5

    sampler = get_pc_sampler("reverse_diffusion", "ald", sde, score, Y=y,
                             denoise=True, eps=eps, snr=snr_v,
                             corrector_steps=1, timestep_type=grid)
    sample_key = jax.random.PRNGKey(99)
    scan_out, _ = sampler(sample_key)

    predictor = ReverseDiffusionPredictor(sde, score)
    corrector = AnnealedLangevinDynamics(sde, score, snr=snr_v, n_steps=1)
    prior_key, scan_key = jax.random.split(sample_key)
    xt, _ = sde.prior_sampling(prior_key, y)
    ts = timesteps_space(sde.T, sde.N, eps, grid)
    k = scan_key
    x_mean = xt
    for i, t in enumerate(ts):
        stepsize = ts[i] - ts[i + 1] if i < len(ts) - 1 else ts[-1]
        k, kc, kp = jax.random.split(k, 3)
        vec_t = jnp.full((1,), float(t))
        xt, x_mean = corrector.update_fn(kc, xt, vec_t, y)
        xt, x_mean = predictor.update_fn(kp, xt, vec_t, y, float(stepsize))

    np.testing.assert_allclose(np.asarray(scan_out), np.asarray(x_mean),
                               rtol=2e-3, atol=2e-4)


def _saturating_score(sde, x0, radius=3.0):
    """A manifold-limited score: exact within ``radius`` marginal stds of the
    mean, saturated (clipped toward the boundary) outside. Models a trained
    network, which is only accurate on inputs near the data distribution it
    saw — unlike the globally-affine exact score, which is right even at a
    30x overshoot and so cannot reproduce the trained-model heun collapse
    (DEVNOTES round 4)."""

    def score(x, t, y):
        mean, std = sde.marginal_prob(x0, t, y)
        s2 = (std[:, None, None, None] ** 2).astype(x.dtype)
        d = x - mean
        # per-sample rms deviation in units of std
        dev = jnp.sqrt(jnp.mean(jnp.abs(d) ** 2, axis=(1, 2, 3), keepdims=True))
        lim = radius * std[:, None, None, None]
        scale = jnp.minimum(1.0, lim / jnp.maximum(dev, 1e-20)).astype(x.dtype)
        return -(d * scale) / s2

    return score


def test_heun_linear_grid_collapses_with_saturating_score():
    """Reproduces the trained-model heun failure mode: on the LINEAR grid the
    first reverse step of BBED (drift ~1/(1-T) = 1000x) makes heun's inner
    Euler stage overshoot ~h/(1-T) ~ 30x off-manifold, where a realistic
    (saturating) score is wrong, and the trajectory never recovers — while
    the same sampler on the logit grid, whose first steps satisfy
    h ~ du*t(1-t), stays on-manifold and recovers x0. reverse_diffusion on
    the linear grid is unaffected (its update is contraction-structured, no
    overshooting inner stage) — which is exactly the asymmetry measured on
    the trained 65M checkpoint."""
    key = jax.random.PRNGKey(5)
    x0, y = _make_problem(key)
    sde = BBED(N=15)
    score = _saturating_score(sde, x0)
    rel = lambda s: float(jnp.linalg.norm(s - x0) / jnp.linalg.norm(x0))

    out = {}
    for grid in ("linear", "logit", "bridge_geom"):
        sampler = get_pc_sampler("heun", "none", sde, score, Y=y,
                                 denoise=False, eps=0.03, timestep_type=grid)
        sample, _ = jax.jit(sampler)(jax.random.PRNGKey(1))
        out[grid] = rel(sample)

    # rd+ald control: fine on the linear grid even with the saturating score
    rd = get_pc_sampler("reverse_diffusion", "ald", sde, score, Y=y,
                        denoise=True, eps=0.03, snr=0.5)
    rd_out, _ = jax.jit(rd)(jax.random.PRNGKey(1))
    assert rel(rd_out) < 0.2, f"rd+ald control broke: {rel(rd_out)}"

    assert out["linear"] > 1.0, (
        f"expected linear-grid heun collapse under saturating score: {out}")
    assert out["logit"] < 0.15, f"logit grid did not fix heun: {out}"
    assert out["bridge_geom"] < 0.5, f"geom grid did not help heun: {out}"


@pytest.mark.parametrize("grid", ["bridge_geom", "logit"])
def test_pc_sampler_alt_grid_recovers_x0(grid):
    """Exact-score sanity on the alternative grids for both rd+ald and heun."""
    key = jax.random.PRNGKey(42)
    x0, y = _make_problem(key)
    sde = BBED(N=15)
    score = _true_score(sde, x0)
    for pred, corr, denoise in (("reverse_diffusion", "ald", True),
                                ("heun", "none", False)):
        sampler = get_pc_sampler(pred, corr, sde, score, Y=y, denoise=denoise,
                                 eps=0.03, snr=0.5, timestep_type=grid)
        sample, _ = jax.jit(sampler)(jax.random.PRNGKey(1))
        rel = float(jnp.linalg.norm(sample - x0) / jnp.linalg.norm(x0))
        assert rel < 0.2, f"{pred}/{grid} missed x0: rel={rel}"


def test_exp_predictors_exact_on_affine_score():
    """With the exact point-mass score the data-prediction step equals the
    closed-form Gaussian probability flow at ANY stepsize: ONE step across
    the whole [T, eps] range lands exactly (up to f32) on the analytic
    solution — the property that absorbs both the bridge-drift and the
    1/std score singularities."""
    from diffse_tpu.sampling.predictors import PredictorRegistry

    key = jax.random.PRNGKey(3)
    x0, y = _make_problem(key, shape=(2, 1, 8, 8))
    for sde in (BBED(N=30), OUVESDE(N=30)):
        score = _true_score(sde, x0)
        T, eps = sde.T, 0.03
        B = x0.shape[0]
        vec = lambda t: jnp.full((B,), t, jnp.float32)
        mT, sT = sde.marginal_prob(x0, vec(T), y)
        me, se = sde.marginal_prob(x0, vec(eps), y)
        z = (jax.random.normal(jax.random.PRNGKey(7), x0.shape)
             + 1j * jax.random.normal(jax.random.PRNGKey(8), x0.shape)
             ).astype(jnp.complex64)
        x_T = mT + sT[:, None, None, None] * z
        x_exact = me + (se / sT)[:, None, None, None] * (x_T - mT)
        for name in ("exp_euler", "exp_heun"):
            pred = PredictorRegistry.get_by_name(name)(sde, score)
            out, _ = pred.update_fn(jax.random.PRNGKey(0), x_T, vec(T), y,
                                    T - eps)
            err = float(jnp.linalg.norm(out - x_exact)
                        / jnp.linalg.norm(x_exact))
            assert err < 1e-3, (
                f"{name} on {type(sde).__name__} not exact: rel={err}")


def _mixture_score(sde, x0a, x0b):
    """Closed-form score of a two-point-mass prior: p_t is a Gaussian
    mixture, non-affine in x — so one step is NOT exact and integration
    order becomes measurable."""

    def score(x, t, y):
        std = sde._std(t)[:, None, None, None]
        s2 = (std ** 2).astype(x.dtype)
        ma, _ = sde.marginal_prob(x0a, t, y)
        mb, _ = sde.marginal_prob(x0b, t, y)
        da, db = x - ma, x - mb
        la = -jnp.sum(jnp.abs(da) ** 2, axis=(1, 2, 3), keepdims=True) / (
            2.0 * jnp.real(s2))
        lb = -jnp.sum(jnp.abs(db) ** 2, axis=(1, 2, 3), keepdims=True) / (
            2.0 * jnp.real(s2))
        m = jnp.maximum(la, lb)
        wa = jnp.exp(la - m)
        wb = jnp.exp(lb - m)
        ga = (wa / (wa + wb)).astype(x.dtype)
        return -(ga * da + (1.0 - ga) * db) / s2

    return score


def test_exp_heun_second_order_exp_euler_first_order():
    """On a non-affine (two-component mixture) score, exp_heun converges
    ~O(h^2) and exp_euler ~O(h) toward the adaptive-RK45 reference solution
    of the same probability-flow ODE, and exp_heun wins at matched NFE."""
    from diffse_tpu.sampling.predictors import PredictorRegistry

    key = jax.random.PRNGKey(3)
    x0a, y = _make_problem(key, shape=(2, 1, 8, 8))
    # component separation ~ std(t) so the responsibilities actually mix
    # along the trajectory (far-apart components saturate to one Gaussian,
    # making the score affine again — and the step exact)
    d = (jax.random.normal(jax.random.PRNGKey(21), x0a.shape)
         + 1j * jax.random.normal(jax.random.PRNGKey(22), x0a.shape)
         ).astype(jnp.complex64)
    x0b = x0a + 0.4 * d / jnp.linalg.norm(d)
    sde = OUVESDE(N=30)
    score = _mixture_score(sde, x0a, x0b)
    eheun = PredictorRegistry.get_by_name("exp_heun")(sde, score)
    eeuler = PredictorRegistry.get_by_name("exp_euler")(sde, score)
    rsde = sde.reverse(score, probability_flow=True)

    T, eps = sde.T, 0.1
    B = x0a.shape[0]
    vec = lambda t: jnp.full((B,), t, jnp.float32)
    mT, sT = sde.marginal_prob(x0a, vec(T), y)
    z = (jax.random.normal(jax.random.PRNGKey(7), x0a.shape)
         + 1j * jax.random.normal(jax.random.PRNGKey(8), x0a.shape)
         ).astype(jnp.complex64)
    x_T = mT + sT[:, None, None, None] * z

    def ode_func(t, x):
        return rsde.sde(x, vec(float(t)) if not hasattr(t, "shape") else
                        jnp.full((B,), t, jnp.float32), y)[0]

    ref = solve_ivp_rk45(ode_func, (T, eps), x_T, rtol=1e-9, atol=1e-10).y

    def run(pred, n):
        ts = np.linspace(T, eps, n + 1)
        x = x_T
        for i in range(n):
            x = pred.update_fn(jax.random.PRNGKey(0), x, vec(float(ts[i])),
                               y, float(ts[i] - ts[i + 1]))[0]
        return x

    err = lambda x: float(jnp.linalg.norm(x - ref))
    e_h = {n: err(run(eheun, n)) for n in (8, 16, 32)}
    e_e = {n: err(run(eeuler, n)) for n in (16, 32)}

    assert e_h[8] / e_h[16] > 3.0, f"exp_heun not 2nd order: {e_h}"
    assert e_h[16] / e_h[32] > 3.0, f"exp_heun not 2nd order: {e_h}"
    assert 1.5 < e_e[16] / e_e[32] < 3.0, f"exp_euler not 1st order: {e_e}"
    # matched NFE: exp_heun at N/2 (same score evals) beats exp_euler at N
    assert e_h[8] < e_e[16]
    assert e_h[16] < e_e[32]


def test_exp_predictors_survive_linear_grid_with_saturating_score():
    """THE motivating property (VERDICT r4 #4): on the reference's LINEAR
    grid with a realistic manifold-limited score — exactly where heun
    collapses N-independently — the exponential integrators recover x0,
    because the exact bridge propagator cannot overshoot no matter the
    stepsize; only the (bounded, saturating) score residual is approximated."""
    key = jax.random.PRNGKey(5)
    x0, y = _make_problem(key)
    sde = BBED(N=15)
    score = _saturating_score(sde, x0)
    rel = lambda s: float(jnp.linalg.norm(s - x0) / jnp.linalg.norm(x0))

    out = {}
    for name in ("exp_euler", "exp_heun"):
        for grid in ("linear", "logit"):
            sampler = get_pc_sampler(name, "none", sde, score, Y=y,
                                     denoise=False, eps=0.03,
                                     timestep_type=grid)
            sample, _ = jax.jit(sampler)(jax.random.PRNGKey(1))
            out[(name, grid)] = rel(sample)

    # heun control: still collapses on the linear grid (same score, same key)
    hs = get_pc_sampler("heun", "none", sde, score, Y=y, denoise=False,
                        eps=0.03, timestep_type="linear")
    h_out, _ = jax.jit(hs)(jax.random.PRNGKey(1))
    assert rel(h_out) > 1.0, f"heun control unexpectedly fine: {rel(h_out)}"

    for k, v in out.items():
        assert v < 0.2, f"{k} missed x0: rel={v} (all: {out})"


def test_pc_sampler_exp_predictor_nfe_accounting():
    """Product path: exp_euler counts 1 NFE/step, exp_heun 2 NFE/step, and
    both recover x0 from the exact score through the scan sampler."""
    key = jax.random.PRNGKey(42)
    x0, y = _make_problem(key)
    sde = BBED(N=15)
    score = _true_score(sde, x0)
    for name, nfe in (("exp_euler", 15), ("exp_heun", 30)):
        sampler = get_pc_sampler(name, "none", sde, score, Y=y,
                                 denoise=False, eps=0.03)
        sample, ns = jax.jit(sampler)(jax.random.PRNGKey(1))
        assert ns == nfe, f"{name}: ns={ns}"
        rel = float(jnp.linalg.norm(sample - x0) / jnp.linalg.norm(x0))
        assert rel < 0.15, f"{name} missed x0: rel={rel}"
