"""Tests for the debug harness (evaluation/debug.py) and the dataset
preparation tool (tools/single_snrize.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig

TINY = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
            attn_resolutions=(16,), image_size=256)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="bbed",
                           snr_conditioned="false", sigma_max=0.5,
                           num_frames=64)
    model = ScoreModel(cfg, backbone_kwargs=TINY,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52,
                                       N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=64)
    return model, variables


def test_get_prior_pieces_consistent(tiny_model):
    """get_prior returns the reconstruction identities of model.py:959-1011:
    x_T = noisy + z*std(T) and mean_pred = x_T + score*std^2."""
    from diffse_tpu.evaluation.debug import get_prior

    model, variables = tiny_model
    rng = np.random.default_rng(0)
    y = rng.standard_normal(4000).astype(np.float32)[None] * 0.1
    x = 0.7 * y
    d = get_prior(model, variables, y, x, key=jax.random.PRNGKey(1), T=0.9)
    for k in ("mean_pred", "clean", "noisy", "residual", "z", "score", "x_T"):
        assert np.all(np.isfinite(d[k].real)), k
    # x_T - noisy = z * std  =>  (x_T - noisy) and z are colinear
    num = np.vdot(d["z"], d["x_T"] - d["noisy"])
    den = np.linalg.norm(d["z"]) * np.linalg.norm(d["x_T"] - d["noisy"])
    assert abs(abs(num) / (den + 1e-12) - 1.0) < 1e-3


def test_prior_panel_writes_png(tiny_model, tmp_path):
    pytest.importorskip("matplotlib")
    from diffse_tpu.evaluation.debug import prior_panel

    model, variables = tiny_model
    rng = np.random.default_rng(1)
    y = rng.standard_normal(4000).astype(np.float32)[None] * 0.1
    out = prior_panel(model, variables, y, 0.5 * y,
                      out_path=str(tmp_path / "panel.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_single_snrize_tool(tmp_path):
    """The remix tool must hit the target active SNR and write the directory
    contract (clean/ noisy/ noise/ + active_rms.txt)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import single_snrize

    from diffse_tpu.data.wavio import read_wav, write_wav
    from diffse_tpu.evaluation.metrics import active_rms

    rng = np.random.default_rng(2)
    in_dir = tmp_path / "in"
    for sub in ("clean", "noisy"):
        os.makedirs(in_dir / sub)
    sr = 16000
    t = np.arange(8000) / sr
    for i in range(2):
        clean = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        noise = (0.05 * rng.standard_normal(len(t))).astype(np.float32)
        write_wav(str(in_dir / "clean" / f"u{i}.wav"), clean, sr)
        write_wav(str(in_dir / "noisy" / f"u{i}.wav"), clean + noise, sr)

    out_dir = tmp_path / "out"
    single_snrize.main(["--in_dir", str(in_dir), "--out_dir", str(out_dir),
                        "--target_snr", "-5"])

    assert os.path.exists(out_dir / "active_rms.txt")
    lines = open(out_dir / "active_rms.txt").read().strip().splitlines()
    assert len(lines) == 2
    for i in range(2):
        c, _ = read_wav(str(out_dir / "clean" / f"u{i}.wav"))
        n, _ = read_wav(str(out_dir / "noise" / f"u{i}.wav"))
        y, _ = read_wav(str(out_dir / "noisy" / f"u{i}.wav"))
        np.testing.assert_allclose(y[0], c[0] + n[0], atol=2e-4)
        c_rms, n_rms = active_rms(c[0], n[0])
        snr = 20 * np.log10(c_rms / n_rms)
        assert abs(snr - (-5.0)) < 0.3, snr


def test_bench_certified_config_selection(tmp_path):
    """bench._load_certified_config picks the lowest-NFE candidate within the
    quality-parity bar (0.02 PESQ / 0.2 dB — VERDICT r4 #2c tightened it
    from the round-4 0.05/0.5), refuses candidates that fail any holdout set
    (_holdout synthetic, _realwav real speech), and returns None with no
    certified candidate."""
    import json as _json

    import bench

    assert bench.CERT_TOL_PESQ == 0.02 and bench.CERT_TOL_SI_SDR == 0.2

    ref = dict(nfe=60, pesq=2.463, si_sdr=-3.54)

    def write(rows):
        p = tmp_path / "sq.json"
        p.write_text(_json.dumps(rows))
        return str(p)

    # no candidate rows -> None
    assert bench._load_certified_config(write({"rd_ald_N30": ref})) is None

    # out-of-tolerance candidate -> None
    rows = {"rd_ald_N30": ref,
            "rd_ald_N15": dict(nfe=30, pesq=2.322, si_sdr=-4.17)}
    assert bench._load_certified_config(write(rows)) is None

    # the round-4 certified config's numbers (d_pesq -0.012, d_si -0.29)
    # FAIL the tightened SI-SDR bar — exactly the verdict's complaint
    rows = {"rd_ald_N30": ref,
            "rd_ald2_logit_N10": dict(nfe=30, pesq=2.451, si_sdr=-3.83)}
    assert bench._load_certified_config(write(rows)) is None

    # two in-tolerance 30-NFE candidates -> higher PESQ wins; 40-NFE loses
    rows = {
        "rd_ald_N30": ref,
        "rd_ald_logit_N20": dict(nfe=40, pesq=2.455, si_sdr=-3.59),
        "rd_ald_logit_N15_snr0.7": dict(nfe=30, pesq=2.450, si_sdr=-3.69),
        "rd_ald2_logit_N10": dict(nfe=30, pesq=2.458, si_sdr=-3.70),
    }
    label, scfg, cert = bench._load_certified_config(write(rows))
    assert label == "rd_ald2_logit_N10"
    assert scfg["corrector_steps"] == 2 and scfg["N"] == 10
    assert cert["certified"] and cert["holdout_validation"] is None
    assert cert["tolerance"] == {"pesq": 0.02, "si_sdr": 0.2}

    # failing holdout row disqualifies the winner; runner-up takes over
    rows2 = dict(rows)
    rows2["rd_ald_N30_holdout"] = dict(nfe=60, pesq=2.5, si_sdr=-3.0)
    rows2["rd_ald2_logit_N10_holdout"] = dict(nfe=30, pesq=2.2, si_sdr=-3.2)
    label2, _, cert2 = bench._load_certified_config(write(rows2))
    assert label2 == "rd_ald_logit_N15_snr0.7"
    assert cert2["holdout_validation"] is None  # runner-up has no holdout row

    # passing holdout row keeps the winner and records the check
    rows3 = dict(rows2)
    rows3["rd_ald2_logit_N10_holdout"] = dict(nfe=30, pesq=2.49, si_sdr=-3.15)
    label3, _, cert3 = bench._load_certified_config(write(rows3))
    assert label3 == "rd_ald2_logit_N10"
    assert cert3["holdout_validation"]["d_pesq"] == -0.01
    assert cert3["realwav_validation"] is None

    # a failing REAL-WAV holdout also disqualifies (deltas must transfer
    # to real speech), even when the synthetic holdout passes
    rows4 = dict(rows3)
    rows4["rd_ald_N30_realwav"] = dict(nfe=60, pesq=1.9, si_sdr=5.0)
    rows4["rd_ald2_logit_N10_realwav"] = dict(nfe=30, pesq=1.7, si_sdr=4.9)
    label4, _, _ = bench._load_certified_config(write(rows4))
    assert label4 == "rd_ald_logit_N15_snr0.7"

    # passing real-wav holdout: winner restored, both validations recorded
    rows5 = dict(rows4)
    rows5["rd_ald2_logit_N10_realwav"] = dict(nfe=30, pesq=1.89, si_sdr=4.85)
    label5, _, cert5 = bench._load_certified_config(write(rows5))
    assert label5 == "rd_ald2_logit_N10"
    assert cert5["holdout_validation"]["d_pesq"] == -0.01
    assert cert5["realwav_validation"]["d_pesq"] == -0.01
    assert cert5["realwav_validation"]["d_si_sdr"] == -0.15


def test_sampler_quality_rejects_holdout_suffix_with_holdout_dir():
    """--label_suffix '_holdout' together with --holdout_dir would label the
    selection and holdout rows identically, silently merging their scores."""
    from tools import sampler_quality

    with pytest.raises(SystemExit):
        sampler_quality.main(["--label_suffix", "_holdout",
                              "--holdout_dir", "/nonexistent"])


@pytest.mark.slow
def test_reproduce_tables_synthetic_dry_run(tmp_path, capsys):
    """The one-command Table-1/2/3 reproduction harness must run its FULL
    pipeline mechanically on synthetic inputs (VERDICT r4 #5: 333 LoC of
    parity harness with no coverage can rot silently): synthetic VBD
    stand-in + tiny fresh checkpoints -> eval CLI -> deep_eval CLI -> every
    table cell compared (unenforced) -> exit code 0."""
    import json as _json

    from tools import reproduce_tables

    rc = reproduce_tables.main(
        ["--synthetic_dry_run", "--out_dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out

    # RESULT line semantics
    line = [l for l in out.splitlines() if "[tables] RESULT" in l][-1]
    res = _json.loads(line.split("RESULT ", 1)[1])
    assert res["verdict"].startswith("DRY-RUN COMPLETE")

    # Table 1 artifacts: per-file eval CSV over the 3 synthetic valid files
    import pandas as pd

    df1 = pd.read_csv(tmp_path / "table1" / "_results.csv")
    assert len(df1) == 3
    for m in ("pesq", "si_sdr", "estoi"):
        assert m in df1.columns

    # Tables 2/3 artifacts: all 27 per-SNR cells present
    df23 = pd.read_csv(tmp_path / "tables23" / "_results_deep.csv")
    for s in reproduce_tables.SNR_GRID:
        for m in ("pesq", "si_sdr", "estoi"):
            assert f"{m}_{s}" in df23.columns, f"missing {m}_{s}"

    # every published cell was compared (printed) for the M6 protocol
    for cell in ("M6 PESQ", "M6 ESTOI", "M6 SI-SDR", "PESQ @ -5 dB",
                 "SI-SDR @ +35 dB"):
        assert cell in out, f"missing comparison line for {cell}"


def test_reproduce_tables_requires_inputs_without_dry_run():
    """Without --synthetic_dry_run the harness must refuse to run when the
    real inputs are missing (exit via argparse error, not a crash later)."""
    from tools import reproduce_tables

    with pytest.raises(SystemExit):
        reproduce_tables.main([])


def test_bench_candidates_covered_by_sampler_quality_sweep():
    """Every bench CERT_CANDIDATES entry must exist in the sampler_quality
    sweep with identical sampler parameters — a mismatch would certify one
    config and serve another."""
    import bench
    from tools import sampler_quality as sq

    labels = {c["label"]: c for c in sq.SWEEP_CONFIGS}
    for k, v in bench.CERT_CANDIDATES.items():
        assert k in labels, f"CERT_CANDIDATES[{k}] missing from sweep"
        c = labels[k]
        assert (c["N"], c["nfe"], c["predictor"], c["corrector"]) == (
            v["N"], v["nfe"], v["predictor"], v["corrector"]), k
        assert c["grid"] == v.get("timestep_type", "linear"), k
        assert c["corrector_steps"] == v.get("corrector_steps", 1), k
        assert c["snr"] == v.get("snr", 0.5), k


@pytest.mark.skipif(not os.path.isdir("/root/reference/dataset"),
                    reason="reference dataset not present")
def test_prep_realwav_holdout_stages_bucket_sized_pairs(tmp_path):
    """The real-wav holdout prep must stage 4 distinct clean/noisy pairs
    that all land in the 2.0-s fixtures' 256-frame width bucket (so the
    certification sweep reuses one compiled enhance program per config),
    with clean/noisy lengths matched per pair."""
    from diffse_tpu.data.wavio import read_wav
    from diffse_tpu.transforms.spec import width_bucket
    from tools import prep_realwav_holdout

    out = str(tmp_path / "rw")
    assert prep_realwav_holdout.main(["--out_dir", out]) == 0
    cleans = sorted(os.listdir(os.path.join(out, "clean")))
    noisys = sorted(os.listdir(os.path.join(out, "noisy")))
    assert cleans == noisys and len(cleans) == 5
    seen = []
    for f in cleans:
        x, sr = read_wav(os.path.join(out, "clean", f))
        y, sr2 = read_wav(os.path.join(out, "noisy", f))
        assert sr == sr2 == 16000
        assert x.shape == y.shape
        assert width_bucket(x.shape[-1], 128)[0] == 256, f
        # active speech survived the trim (PESQ needs a live signal)
        assert float(np.sqrt((x ** 2).mean())) > 1e-3, f
        seen.append(y)
    # the four mixtures are pairwise distinct (no duplicated pair)
    for i in range(len(seen)):
        for j in range(i + 1, len(seen)):
            n = min(seen[i].shape[-1], seen[j].shape[-1])
            assert not np.array_equal(seen[i][:, :n], seen[j][:, :n])
