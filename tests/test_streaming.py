"""Streaming chunked enhancement tests, including an OLA-exactness check with
an identity enhancement function."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.evaluation import streaming
from diffse_tpu.evaluation.streaming import _crossfade_weights, enhance_streamed
from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig

TINY_BACKBONE = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                     attn_resolutions=(16,), image_size=256)


def _model():
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge_v2",
                           snr_conditioned="false", sigma_max=1.0, num_frames=64)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    return model, variables


def test_crossfade_weights_complementary():
    """Tail ramp of one chunk + head ramp of the next must sum to 1 over the
    overlap (so OLA is exactly energy-preserving)."""
    w = _crossfade_weights(100, 20, "mid")
    np.testing.assert_allclose(w[-20:] + w[:20], 1.0, atol=1e-6)
    assert np.all(w[20:-20] == 1.0)
    w_first = _crossfade_weights(100, 20, "first")
    assert np.all(w_first[:20] == 1.0)


def test_ola_reconstruction_with_identity_enhancement(rng, monkeypatch):
    """If each chunk's 'enhancement' returns the chunk itself, the chunked
    overlap-add must reconstruct the input exactly."""
    model, variables = _model()

    def fake_eval_fn(model_, branch, t_pad, fixed_snr=None, sampler_kwargs=None):
        def fn(variables_, xb, yb, key, est):
            return yb
        return fn

    monkeypatch.setattr(streaming, "_eval_fn", fake_eval_fn)
    y = rng.standard_normal(30000).astype(np.float32) * 0.1
    out = enhance_streamed(model, variables, y, "sebridge_v2",
                           jax.random.PRNGKey(0), chunk_frames=64,
                           overlap_frames=16)
    assert out.shape == y.shape
    np.testing.assert_allclose(out, y, atol=1e-5)


def test_lone_chunk_with_trim_keeps_tail(rng, monkeypatch):
    """A single-chunk utterance with trim_frames > 0 must not trim its own
    tail edge (regression: pos='first' used to trim the utterance tail into a
    wsum=0 region, emitting silence)."""
    model, variables = _model()

    def fake_eval_fn(model_, branch, t_pad, fixed_snr=None, sampler_kwargs=None):
        def fn(variables_, xb, yb, key, est):
            return yb
        return fn

    monkeypatch.setattr(streaming, "_eval_fn", fake_eval_fn)
    hop = model.cfg.hop_length
    chunk_len = (64 - 1) * hop
    # exactly one chunk long, with a loud tail that must survive
    y = rng.standard_normal(chunk_len).astype(np.float32) * 0.1
    y[-6 * hop:] = 0.5
    out = enhance_streamed(model, variables, y, "sebridge_v2",
                           jax.random.PRNGKey(3), chunk_frames=64,
                           overlap_frames=16, trim_frames=4)
    assert out.shape == y.shape
    np.testing.assert_allclose(out, y, atol=1e-5)


def test_streamed_enhancement_real_model(rng):
    model, variables = _model()
    y = rng.standard_normal(25000).astype(np.float32) * 0.1
    out = enhance_streamed(model, variables, y, "sebridge_v2",
                           jax.random.PRNGKey(1))
    assert out.shape == y.shape
    assert np.all(np.isfinite(out))


def test_streamed_short_utterance(rng):
    """Utterances shorter than one chunk still work (single chunk path)."""
    model, variables = _model()
    y = rng.standard_normal(3000).astype(np.float32) * 0.1
    out = enhance_streamed(model, variables, y, "sebridge_v2",
                           jax.random.PRNGKey(2))
    assert out.shape == y.shape
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_streaming_vs_full_context_quality():
    """Quantify chunk-boundary degradation: streamed output vs full-context
    enhancement of the same utterance, across overlap settings, on the
    deterministic 'sebridge' branch (no sampler noise, so every discrepancy
    is chunking). Agreement is SI-SDR of streamed against full-context;
    overlap must improve it and the production setting must be high-fidelity.
    """
    from diffse_tpu.evaluation.inference import _eval_fn
    from diffse_tpu.evaluation.metrics import si_sdr

    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge",
                           snr_conditioned="false", sigma_max=1.0, num_frames=64)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    # NCSN++ zero-inits its output convs (init_scale=0), so an untrained net
    # contributes nothing and chunking would be invisible. Perturb all params
    # so the network path is live and context-dependent.
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)

    rng = np.random.default_rng(7)
    t = np.arange(32000) / 16000.0  # 2 s
    clean = np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 1.7 * t) ** 2)
    y = (clean + 0.3 * rng.standard_normal(len(t))).astype(np.float32) * 0.1

    # full-context: one call at the whole padded width
    frames = 1 + len(y) // model.cfg.hop_length
    t_pad = frames + (64 - frames % 64) % 64
    full_fn = _eval_fn(model, "sebridge", t_pad)
    yb = jnp.asarray(y)[None]
    full = np.asarray(full_fn(variables, yb, yb, jax.random.PRNGKey(1),
                              jnp.asarray([1.0])))[0, : len(y)]

    agreements = {}
    for overlap in (0, 8, 16, 32):
        streamed = enhance_streamed(model, variables, y, "sebridge",
                                    jax.random.PRNGKey(1), chunk_frames=64,
                                    overlap_frames=overlap)
        agreements[overlap] = float(si_sdr(full, streamed))
    print("streaming agreement vs full-context (SI-SDR dB):", agreements)

    # more overlap -> better agreement (allow small non-monotonic jitter)
    assert agreements[32] > agreements[0] - 1.0, agreements
    # Worst-case bound: a *randomly perturbed* net has a global receptive
    # field (every output sample depends on the whole chunk), making this the
    # adversarial upper bound on chunking error — trained enhancement nets
    # are far more local. Even so the production setting must keep
    # streamed/full-context agreement above 5 dB SI-SDR.
    assert agreements[16] > 5.0, agreements
    assert agreements[32] > 8.0, agreements


def test_ola_reconstruction_with_trim(rng, monkeypatch):
    """Identity enhancement + edge-trimming must still reconstruct exactly
    (the kept regions overlap and cross-fades stay complementary)."""
    model, variables = _model()

    def fake_eval_fn(model_, branch, t_pad, fixed_snr=None, sampler_kwargs=None):
        def fn(variables_, xb, yb, key, est):
            return yb
        return fn

    monkeypatch.setattr(streaming, "_eval_fn", fake_eval_fn)
    y = rng.standard_normal(30000).astype(np.float32) * 0.1
    out = enhance_streamed(model, variables, y, "sebridge_v2",
                           jax.random.PRNGKey(0), chunk_frames=64,
                           overlap_frames=16, trim_frames=4)
    assert out.shape == y.shape
    np.testing.assert_allclose(out, y, atol=1e-5)


@pytest.mark.slow
def test_streaming_trim_improves_agreement():
    """Discarding chunk-edge frames (least context + iSTFT taper) before the
    overlap-add must not hurt streamed/full-context agreement, and typically
    improves it (measured on the adversarial randomly-perturbed net)."""
    from diffse_tpu.evaluation.inference import _eval_fn
    from diffse_tpu.evaluation.metrics import si_sdr

    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge",
                           snr_conditioned="false", sigma_max=1.0, num_frames=64)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)

    rng = np.random.default_rng(7)
    t = np.arange(32000) / 16000.0
    clean = np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 1.7 * t) ** 2)
    y = (clean + 0.3 * rng.standard_normal(len(t))).astype(np.float32) * 0.1

    frames = 1 + len(y) // model.cfg.hop_length
    t_pad = frames + (64 - frames % 64) % 64
    full_fn = _eval_fn(model, "sebridge", t_pad)
    yb = jnp.asarray(y)[None]
    full = np.asarray(full_fn(variables, yb, yb, jax.random.PRNGKey(1),
                              jnp.asarray([1.0])))[0, : len(y)]

    base = float(si_sdr(full, enhance_streamed(
        model, variables, y, "sebridge", jax.random.PRNGKey(1),
        chunk_frames=64, overlap_frames=16, trim_frames=0)))
    trimmed = float(si_sdr(full, enhance_streamed(
        model, variables, y, "sebridge", jax.random.PRNGKey(1),
        chunk_frames=64, overlap_frames=16, trim_frames=4)))
    print(f"agreement no-trim {base:.2f} dB, trim4 {trimmed:.2f} dB")
    assert trimmed > base - 0.5, (base, trimmed)


# ----------------------------------------------- spec-domain streaming path


def test_spec_streamed_identity_reconstruction(rng, monkeypatch):
    """With the branch core replaced by identity (return Y), spec-domain
    streaming reduces to STFT -> chunk -> crossfade-OLA -> iSTFT, which must
    reconstruct the input exactly (the frame chunks tile the full spec and
    the crossfade weights sum to 1)."""
    from diffse_tpu.evaluation.streaming import enhance_streamed_spec

    model, variables = _model()

    def fake_spec_sample(model_, variables_, branch, X, Y, key, est, fs,
                         noise_size=None):
        return Y

    monkeypatch.setattr(streaming, "spec_sample", fake_spec_sample)
    streaming._stream_cache(model).clear()
    y = rng.standard_normal(30000).astype(np.float32) * 0.1
    out = enhance_streamed_spec(model, variables, y, "sebridge_v2",
                                jax.random.PRNGKey(0), chunk_frames=64,
                                overlap_frames=4)
    streaming._stream_cache(model).clear()
    assert out.shape == y.shape
    np.testing.assert_allclose(out, y, atol=1e-4)


def test_spec_streamed_real_model_and_short_utterance(rng):
    from diffse_tpu.evaluation.streaming import enhance_streamed_spec

    model, variables = _model()
    for nlen in (25000, 3000):
        y = rng.standard_normal(nlen).astype(np.float32) * 0.1
        out = enhance_streamed_spec(model, variables, y, "sebridge_v2",
                                    jax.random.PRNGKey(1))
        assert out.shape == y.shape
        assert np.all(np.isfinite(out))


def test_spec_streamed_single_chunk_equals_full_context(rng):
    """An utterance that fits one chunk must match the full-context eval path
    exactly (same normalization, same spec, same draws)."""
    from diffse_tpu.evaluation.inference import eval_enhance_file
    from diffse_tpu.evaluation.streaming import enhance_streamed_spec

    model, variables = _model()
    y = rng.standard_normal(63 * 128).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(3)
    full = eval_enhance_file(model, variables, y, y, "sebridge_v2", key)
    streamed = enhance_streamed_spec(model, variables, y, "sebridge_v2", key,
                                     chunk_frames=64, overlap_frames=4)
    np.testing.assert_allclose(streamed, full, atol=1e-4)


@pytest.mark.slow
def test_spec_streaming_beats_wav_streaming_agreement():
    """Spec-domain chunking gives every chunk REAL boundary context (no
    per-chunk reflect padding, per-utterance normalization), so its
    agreement with full-context enhancement must be at least as good as the
    waveform-domain path at the same overlap."""
    from diffse_tpu.evaluation.inference import _eval_fn
    from diffse_tpu.evaluation.metrics import si_sdr
    from diffse_tpu.evaluation.streaming import enhance_streamed_spec

    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge",
                           snr_conditioned="false", sigma_max=1.0, num_frames=64)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)

    rng = np.random.default_rng(7)
    t = np.arange(32000) / 16000.0
    clean = np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 1.7 * t) ** 2)
    y = (clean + 0.3 * rng.standard_normal(len(t))).astype(np.float32) * 0.1

    frames = 1 + len(y) // model.cfg.hop_length
    t_pad = frames + (64 - frames % 64) % 64
    full_fn = _eval_fn(model, "sebridge", t_pad)
    yb = jnp.asarray(y)[None]
    full = np.asarray(full_fn(variables, yb, yb, jax.random.PRNGKey(1),
                              jnp.asarray([1.0])))[0, : len(y)]

    spec_agr, wav_agr = {}, {}
    for overlap in (0, 4, 8, 16):
        s = enhance_streamed_spec(model, variables, y, "sebridge",
                                  jax.random.PRNGKey(1), chunk_frames=64,
                                  overlap_frames=overlap)
        spec_agr[overlap] = float(si_sdr(full, s))
        w = enhance_streamed(model, variables, y, "sebridge",
                             jax.random.PRNGKey(1), chunk_frames=64,
                             overlap_frames=overlap)
        wav_agr[overlap] = float(si_sdr(full, w))
    print("full-context agreement (SI-SDR dB)  spec:", spec_agr, " wav:", wav_agr)
    # spec-domain must not be worse than wav-domain anywhere (tolerance 1 dB)
    for ov in spec_agr:
        assert spec_agr[ov] > wav_agr[ov] - 1.0, (spec_agr, wav_agr)
    assert spec_agr[16] > 5.0, spec_agr


def test_packed_matches_per_utterance_spec_streaming(rng):
    """Cross-utterance packed serving must produce the same waveforms as the
    per-utterance spec-domain path on a deterministic branch (no sampler
    noise), across mixed lengths and batch geometries that split one
    utterance's chunks across hot batches."""
    from diffse_tpu.evaluation.streaming import (
        enhance_streamed_packed,
        enhance_streamed_spec,
    )

    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge",
                           snr_conditioned="false", sigma_max=1.0, num_frames=64)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    # Perturb params so the zero-init output convs contribute (see above).
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)

    lengths = [11000, 30000, 7000, 22000]  # 1..4 chunks each at chunk 64
    ys = [rng.standard_normal(t).astype(np.float32) * 0.1 for t in lengths]

    refs = [
        enhance_streamed_spec(model, variables, y, "sebridge",
                              jax.random.PRNGKey(1), chunk_frames=64,
                              overlap_frames=2)
        for y in ys
    ]
    for batch_size in (3, 16):
        outs = enhance_streamed_packed(
            model, variables, ys, "sebridge", jax.random.PRNGKey(1),
            chunk_frames=64, overlap_frames=2, batch_size=batch_size,
        )
        assert len(outs) == len(ys)
        for out, ref, y in zip(outs, refs, ys):
            assert out.shape == y.shape
            np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_packed_snr_branch_smoke(rng):
    """Per-utterance est_snr values flow into each utterance's chunks (prep
    normalization + per-row sampler conditioning) without shape errors."""
    from diffse_tpu.evaluation.streaming import enhance_streamed_packed

    model, variables = _model()
    ys = [rng.standard_normal(t).astype(np.float32) * 0.1
          for t in (9000, 20000)]
    outs = enhance_streamed_packed(
        model, variables, ys, "sebridge_v2_snr", jax.random.PRNGKey(5),
        chunk_frames=64, overlap_frames=2, batch_size=4,
        est_snrs=[0.3, 2.5], fixed_snr=0.17783,
    )
    for out, y in zip(outs, ys):
        assert out.shape == y.shape
        assert np.all(np.isfinite(out))


def test_packed_v2_fixed_matches_per_utterance(monkeypatch, rng):
    """sebridge_v2_fixed packed serving must equal the per-utterance spec
    path even when a quiet utterance shares hot batches with a 10x louder
    one (the rescale magnitude is per-utterance, not per-hot-batch).
    Sampler noise is removed so any difference is the rescale."""
    from diffse_tpu.evaluation import inference as inf
    from diffse_tpu.evaluation.streaming import (
        enhance_streamed_packed,
        enhance_streamed_spec,
    )

    monkeypatch.setattr(inf, "randn_like", lambda key, x: jnp.zeros_like(x))
    model, variables = _model()
    xs, ys = [], []
    # Different noise RATIOS (per-utterance normalization erases pure scale
    # differences), so a cross-batch max would visibly change the rescale.
    for noise_ratio, t in ((0.05, 17000), (1.5, 24000)):
        x = rng.standard_normal(t).astype(np.float32) * 0.1
        xs.append(x)
        ys.append(x + rng.standard_normal(t).astype(np.float32)
                  * 0.1 * noise_ratio)

    refs = [
        enhance_streamed_spec(model, variables, y, "sebridge_v2_fixed",
                              jax.random.PRNGKey(1), chunk_frames=64,
                              overlap_frames=2, x_wav=x, fixed_snr=0.3)
        for x, y in zip(xs, ys)
    ]
    outs = enhance_streamed_packed(
        model, variables, ys, "sebridge_v2_fixed", jax.random.PRNGKey(1),
        chunk_frames=64, overlap_frames=2, batch_size=3, x_wavs=xs,
        fixed_snr=0.3,
    )
    for out, ref in zip(outs, refs):
        scale = np.max(np.abs(ref)) or 1.0
        np.testing.assert_allclose(out / scale, ref / scale, atol=2e-5)


def test_spec_streaming_sampler_kwargs_override(rng):
    """sampler_kwargs must reach the bbed chunk sampler: the certified
    NFE-reduction config (heun/none, reduced N) runs, explicit reference
    defaults reproduce the default path bit-exactly, and the override
    participates in the jit cache key (no silent config reuse)."""
    from diffse_tpu.evaluation import streaming
    from diffse_tpu.evaluation.streaming import enhance_streamed_spec

    model, variables = _model()
    streaming._stream_cache(model).clear()
    y = rng.standard_normal(20000).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(7)

    default = enhance_streamed_spec(model, variables, y, "bbed", key)
    explicit = enhance_streamed_spec(
        model, variables, y, "bbed", key,
        sampler_kwargs={"predictor": "reverse_diffusion", "corrector": "ald",
                        "N": 30})
    np.testing.assert_allclose(explicit, default, atol=0)

    heun = enhance_streamed_spec(
        model, variables, y, "bbed", key,
        sampler_kwargs={"predictor": "heun", "corrector": "none", "N": 4})
    assert heun.shape == y.shape and np.all(np.isfinite(heun))
    assert not np.allclose(heun, default)  # genuinely different sampler
    # three distinct programs were compiled (cache keyed on the override)
    keys = [k for k in streaming._stream_cache(model) if k[0] == "spec"]
    assert len(keys) == 3
    streaming._stream_cache(model).clear()


def test_certified_config_override_all_serving_paths(rng):
    """The certified 30-NFE config (rd_ald2_logit_N10: corrector_steps=2 +
    timestep_type='logit' + N=10) must be expressible on every serving
    surface: wav streaming, batched eval, and the per-utterance _eval_fn —
    each runs, stays finite, and differs from the default config."""
    from diffse_tpu.evaluation.batch_eval import batch_enhance
    from diffse_tpu.evaluation.streaming import enhance_streamed

    model, variables = _model()
    sk = {"N": 10, "corrector_steps": 2, "timestep_type": "logit"}
    y = rng.standard_normal(16000).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(3)

    default_w = enhance_streamed(model, variables, y, "bbed", key,
                                 overlap_frames=2)
    cert_w = enhance_streamed(model, variables, y, "bbed", key,
                              overlap_frames=2, sampler_kwargs=sk)
    assert cert_w.shape == y.shape and np.all(np.isfinite(cert_w))
    assert not np.allclose(cert_w, default_w)

    outs = batch_enhance(model, variables, [y], [y], "bbed", key,
                         batch_size=1, sampler_kwargs=sk)
    assert outs[0].shape == y.shape and np.all(np.isfinite(outs[0]))
