"""Eval-harness branch tests: every evaluate_model branch produces finite
audio of the right length; deep sweep shapes; oracle/estimated SNR paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.evaluation.inference import eval_enhance_file
from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.models.snrnet import SNRNet

TINY_BACKBONE = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                     attn_resolutions=(16,), image_size=256)


def _model(snr_conditioned, model_type, with_snr_model=False):
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type=model_type,
        snr_conditioned=snr_conditioned, fixed_snr=0.17783, sigma_max=1.0,
        num_frames=32,
    )
    snr_model = None
    if with_snr_model:
        dnn = SNRNet()
        snr_vars = dnn.init(jax.random.PRNGKey(5), jnp.zeros((1, 2, 256, 32)))
        snr_model = (dnn, snr_vars)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
                       snr_model=snr_model)
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=32)
    return model, variables


def _wavs(rng, n=4000):
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    y = x + rng.standard_normal(n).astype(np.float32) * 0.05
    return x, y


@pytest.mark.parametrize(
    "snr_conditioned,model_type,branch",
    [
        ("false", "sebridge", "sebridge"),
        ("false", "sebridge_v2", "sebridge_v2"),
        ("fixed", "sebridge_v2", "sebridge_v2_fixed"),
        ("fixed", "sebridge_v3", "sebridge_v3_fixed"),
        ("true", "sebridge_v2", "sebridge_v2_snr"),
        ("true", "sebridge_v3", "sebridge_v3_snr"),
    ],
)
def test_eval_branches_produce_audio(rng, snr_conditioned, model_type, branch):
    model, variables = _model(snr_conditioned, model_type)
    x, y = _wavs(rng)
    x_hat = eval_enhance_file(model, variables, x, y, branch,
                              jax.random.PRNGKey(1), est_snr=0.3)
    assert x_hat.shape == x.shape
    assert np.all(np.isfinite(x_hat))


def test_eval_bbed_branch_pc_sampler(rng):
    model, variables = _model("false", "bbed")
    x, y = _wavs(rng, n=3000)
    x_hat = eval_enhance_file(model, variables, x, y, "bbed", jax.random.PRNGKey(1))
    assert x_hat.shape == x.shape and np.all(np.isfinite(x_hat))


def test_enhance_snr_conditioned_with_estimator(rng):
    """Full enhance() with a (random) SNR estimator: t snapping + normfac."""
    model, variables = _model("true", "sebridge_v3", with_snr_model=True)
    x, y = _wavs(rng)
    x_hat = model.enhance(variables, jnp.asarray(x)[None], jnp.asarray(y)[None],
                          key=jax.random.PRNGKey(2))
    assert x_hat.shape == x.shape and np.all(np.isfinite(x_hat))


def test_enhance_oracle_path(rng):
    model, variables = _model("true", "sebridge_v3")
    x, y = _wavs(rng)
    x_hat = model.enhance(variables, jnp.asarray(x)[None], jnp.asarray(y)[None],
                          key=jax.random.PRNGKey(2), oracle=True,
                          clean_rms=0.1, noise_rms=0.17)
    assert x_hat.shape == x.shape and np.all(np.isfinite(x_hat))


def test_enhance_ode_sampler(rng):
    model, variables = _model("false", "bbed")
    x, y = _wavs(rng, n=3000)
    x_hat = model.enhance(variables, jnp.asarray(x)[None], jnp.asarray(y)[None],
                          key=jax.random.PRNGKey(3), sampler_type="ode", N=30)
    assert x_hat.shape == x.shape and np.all(np.isfinite(x_hat))


def test_enhance_full_length_on_exact_bucket_boundary(rng):
    """When frames % 64 == 0 and t_orig % hop != 0, the iSTFT can only yield
    (t_pad-1)*hop samples; enhance()/eval_enhance_file must zero-pad the tail
    back to t_orig so si_sdr against the full-length clean never
    shape-mismatches (regression for the codified hop-1 truncation)."""
    model, variables = _model("false", "sebridge_v2")
    hop = model.cfg.hop_length
    # frames = 1 + t_orig//hop = 64 (a multiple of 64), t_orig % hop != 0
    t_orig = 63 * hop + 37
    x, y = _wavs(rng, n=t_orig)
    x_hat = eval_enhance_file(model, variables, x, y, "sebridge_v2",
                              jax.random.PRNGKey(1))
    assert x_hat.shape == (t_orig,)
    assert np.all(np.isfinite(x_hat))
    x_hat2 = model.enhance(variables, x[None], y[None], key=jax.random.PRNGKey(2))
    assert x_hat2.shape == (t_orig,)
    # full-length alignment means the downstream metric just works
    from diffse_tpu.evaluation.metrics import si_sdr
    assert np.isfinite(float(si_sdr(x, x_hat)))


@pytest.mark.slow
def test_eval_enhance_file_length_variation_reuses_one_compile():
    """Different utterance lengths in one 64-frame bucket must share a single
    compiled eval program (host zero-pad to the bucket's sample count)."""
    from diffse_tpu.evaluation import inference as inf

    model, variables = _model("false", "sebridge_v2")
    rng = np.random.default_rng(0)
    for n in (2048, 5000):
        y = rng.standard_normal(n).astype(np.float32) * 0.1
        out = inf.eval_enhance_file(model, variables, y, y, "sebridge_v2",
                                    jax.random.PRNGKey(1))
        assert out.shape == (n,)
    # eval jits live on the model (no module-global pinning); one program
    # serves both lengths in the bucket
    assert len(model._eval_jit_cache) == 1
    jitted = next(iter(model._eval_jit_cache.values()))
    assert jitted._cache_size() == 1, jitted._cache_size()


def test_v2_fixed_batched_rows_independent(monkeypatch):
    """sebridge_v2_fixed's rescale magnitude (|X-Y| max) must be computed per
    ROW: batching a quiet utterance with a 10x louder one must not change
    either row's output (regression: noise_mag was taken over the whole
    batch, coupling utterances through whoever they were batched with)."""
    from diffse_tpu.evaluation import inference as inf

    monkeypatch.setattr(inf, "randn_like", lambda key, x: jnp.zeros_like(x))
    model, variables = _model("false", "sebridge_v2", with_snr_model=False)
    rng = np.random.default_rng(3)
    n = 3968  # 32 frames: matches the t_pad=32 bucket below
    # Row 0: lightly noisy. Row 1: much noisier (per-row normalization maps
    # scaled copies to identical specs, so only a different noise RATIO can
    # expose cross-row coupling of the rescale magnitude).
    x0 = rng.standard_normal(n).astype(np.float32) * 0.1
    y0 = x0 + rng.standard_normal(n).astype(np.float32) * 0.01
    x1 = rng.standard_normal(n).astype(np.float32) * 0.1
    y1 = x1 + rng.standard_normal(n).astype(np.float32) * 0.2

    fn = inf._eval_fn(model, "sebridge_v2_fixed", 32, fixed_snr=0.3)
    key = jax.random.PRNGKey(0)
    est = jnp.asarray([1.0, 1.0])
    xb = jnp.stack([x0, x1])
    yb = jnp.stack([y0, y1])
    batched = np.asarray(fn(variables, xb, yb, key, est))
    solo0 = np.asarray(fn(variables, x0[None], y0[None], key,
                          jnp.asarray([1.0])))[0]
    solo1 = np.asarray(fn(variables, x1[None], y1[None], key,
                          jnp.asarray([1.0])))[0]
    np.testing.assert_allclose(batched[0], solo0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batched[1], solo1, rtol=1e-5, atol=1e-5)


def test_estimate_snr_batch_rows_independent(rng):
    """estimate_snr normalizes per ROW: batching utterances of very different
    loudness must return the same estimates as one-at-a-time calls (the deep
    sweep now estimates all nine SNR variants in one batch)."""
    model, variables = _model("true", "sebridge_v3", with_snr_model=True)
    y0 = rng.standard_normal(4000).astype(np.float32) * 0.01
    y1 = rng.standard_normal(4000).astype(np.float32) * 1.0
    batch = np.asarray(model.estimate_snr(jnp.stack([y0, y1])))
    solo0 = float(model.estimate_snr(jnp.asarray(y0)[None])[0])
    solo1 = float(model.estimate_snr(jnp.asarray(y1)[None])[0])
    np.testing.assert_allclose(batch, [solo0, solo1], rtol=1e-5)
