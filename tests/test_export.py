"""AOT artifact export (diffse_tpu/serving/export.py): the serialized
StableHLO program + npz weights must reproduce ScoreModel.enhance exactly
through the framework-free loader."""

import jax
import numpy as np
import pytest

from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.serving.export import (
    _flatten_variables,
    _unflatten_variables,
    export_enhance,
    load_artifact,
    save_artifact,
)

TINY_BACKBONE = dict(nf=4, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), image_size=256)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="sebridge_v2",
        snr_conditioned="false", sigma_max=1.0,
    )
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52,
                                       N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    return model, variables


def test_flatten_unflatten_roundtrip():
    tree = {"params": {"Conv_0": {"kernel": np.ones((2, 3)),
                                  "bias": np.zeros(3)},
                       "GroupNorm_0": {"scale": np.full(4, 2.0)}}}
    rt = _unflatten_variables(_flatten_variables(tree))
    assert rt["params"]["Conv_0"]["kernel"].shape == (2, 3)
    np.testing.assert_array_equal(rt["params"]["GroupNorm_0"]["scale"],
                                  tree["params"]["GroupNorm_0"]["scale"])


def test_artifact_matches_enhance_1nfe(tiny_model, tmp_path):
    model, variables = tiny_model
    rng = np.random.default_rng(0)
    y = (rng.standard_normal(4800) * 0.1).astype(np.float32)

    direct = model.enhance(variables, y[None], y[None],
                           key=jax.random.PRNGKey(7))

    out_dir = str(tmp_path / "artifact")
    meta = save_artifact(out_dir, model, variables, "sebridge_v2",
                         utt_samples=len(y), platforms=("cpu",))
    assert meta["pad_samples"] == (64 - 1) * 128

    enhance, meta2 = load_artifact(out_dir)
    got = enhance(y, seed=7)
    assert got.shape == direct.shape
    np.testing.assert_allclose(got, direct, rtol=1e-6, atol=1e-7)
    assert meta2["branch"] == "sebridge_v2"


@pytest.mark.slow
def test_artifact_matches_enhance_pc_sampler(tiny_model, tmp_path):
    """Full PC-sampler program (scan over reverse steps) exports and agrees."""
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5,
    )
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52,
                                       N=3))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    rng = np.random.default_rng(1)
    y = (rng.standard_normal(3000) * 0.1).astype(np.float32)

    direct = model.enhance(variables, y[None], y[None],
                           key=jax.random.PRNGKey(3), N=3)

    out_dir = str(tmp_path / "artifact_pc")
    save_artifact(out_dir, model, variables, "bbed_pc", utt_samples=len(y),
                  n_steps=3, platforms=("cpu",))
    enhance, _ = load_artifact(out_dir)
    got = enhance(y, seed=3)
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-6)


def test_multiplatform_export_lowers(tiny_model):
    """Cross-platform lowering (tpu+cpu) must succeed from a CPU host —
    the artifact is deploy-anywhere StableHLO (pure XLA ops)."""
    model, variables = tiny_model
    exported, bucket = export_enhance(
        model, variables, "sebridge_v2", utt_samples=4800,
        platforms=("tpu", "cpu"),
    )
    assert set(p.lower() for p in exported.platforms) == {"tpu", "cpu"}
    assert bucket["t_pad"] == 64
    data = exported.serialize()
    assert len(data) > 1000


def test_multibucket_artifact_picks_smallest_fit(tiny_model, tmp_path):
    model, variables = tiny_model
    out_dir = str(tmp_path / "mb")
    meta = save_artifact(out_dir, model, variables, "sebridge_v2",
                         utt_samples=[4800, 20000], platforms=("cpu",))
    pads = [b["pad_samples"] for b in meta["buckets"]]
    assert pads == [(64 - 1) * 128, (192 - 1) * 128]

    enhance, _ = load_artifact(out_dir)
    rng = np.random.default_rng(2)
    short = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    long = (rng.standard_normal(15000) * 0.1).astype(np.float32)
    assert enhance(short, seed=1).shape == (3000,)
    assert enhance(long, seed=1).shape == (15000,)
    # short utterance must match the model's own bucket-64 enhancement
    direct = model.enhance(variables, short[None], short[None],
                           key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(enhance(short, seed=1), direct,
                               rtol=1e-6, atol=1e-7)
    with pytest.raises(ValueError):
        enhance(np.zeros(40000, np.float32))


def test_artifact_http_serving(tiny_model, tmp_path):
    """serve.py --artifact: the HTTP front end over the deserialized program
    must return the artifact loader's exact output."""
    import json
    import urllib.request

    from diffse_tpu.cli.serve import main as serve_main
    from diffse_tpu.data.wavio import parse_wav, wav_bytes
    from diffse_tpu.serving.export import load_artifact

    model, variables = tiny_model
    art = str(tmp_path / "art")
    save_artifact(art, model, variables, "sebridge_v2", utt_samples=4800,
                  platforms=("cpu",))

    server, service, thread = serve_main(
        ["--artifact", art, "--port", "0"], block=False)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    rng = np.random.default_rng(3)
    y = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    try:
        req = urllib.request.Request(
            base + "/enhance", data=wav_bytes(y, 16000, subtype="float32"),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            got, sr = parse_wav(r.read(), name="<resp>")
        assert sr == 16000
        enhance, _ = load_artifact(art)
        expected = enhance(y, seed=0)  # the service's first request uses seed 0
        np.testing.assert_allclose(got[0], expected, rtol=1e-6, atol=1e-7)

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 1 and stats["branch"] == "sebridge_v2"
    finally:
        server.shutdown()
        service.close()


def test_artifact_serves_truncation_bucket_lengths(tiny_model, tmp_path):
    """Lengths with frames % 64 == 0 (t_orig up to hop-1 beyond pad_samples)
    must be served by truncation — exactly ScoreModel.enhance's contract —
    not rejected."""
    model, variables = tiny_model
    art = str(tmp_path / "edge")
    meta = save_artifact(art, model, variables, "sebridge_v2",
                         utt_samples=8100, platforms=("cpu",))
    assert meta["buckets"][0]["pad_samples"] == 8064  # bucket < utterance
    enhance, _ = load_artifact(art)
    y = (np.random.default_rng(5).standard_normal(8100) * 0.1).astype(
        np.float32)
    got = enhance(y, seed=4)
    direct = model.enhance(variables, y[None], y[None],
                           key=jax.random.PRNGKey(4))
    assert got.shape == (8100,)
    np.testing.assert_allclose(got, direct, rtol=1e-6, atol=1e-7)
    with pytest.raises(ValueError):
        enhance(np.zeros(0, np.float32))
