"""CLI smoke tests: train -> eval -> eval_snr_est end-to-end via the argparse
surface (subprocess-free: call main() in-process on the CPU test platform)."""

import json
import os

import numpy as np
import pytest

from diffse_tpu.data.synthetic import make_synthetic_dataset

TINY_ARGS = [
    "--nf", "4", "--ch_mult", "1", "1", "--attn_resolutions", "8",
    "--image_size", "256",
]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clids"))
    return make_synthetic_dataset(root, num_train=4, num_valid=2, num_valid2=2,
                                  num_test=2, duration_s=0.7)


@pytest.mark.slow
def test_train_cli_smoke(dataset, tmp_path):
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "run")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--no_mesh", "--seed", "0",
        "--chain_steps", "2",  # 1 dispatch = 2 fused optimizer updates
        *TINY_ARGS,
    ])
    assert os.path.exists(os.path.join(ckpt_dir, "hparams.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "metadata.json"))
    with open(os.path.join(ckpt_dir, "hparams.json")) as f:
        hp = json.load(f)
    assert hp["config"]["model_type"] == "sebridge_v2"
    assert hp["backbone_kwargs"]["nf"] == 4

    # eval CLI on the checkpoint
    from diffse_tpu.cli.eval import main as eval_main

    out_dir = str(tmp_path / "eval_out")
    eval_main([
        "--destination_folder", out_dir,
        "--test_dir", os.path.join(dataset, "test"),
        "--ckpt", ckpt_dir,
    ])
    assert os.path.exists(os.path.join(out_dir, "_results.csv"))
    assert os.path.exists(os.path.join(out_dir, "_avg_results.txt"))
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "_results.csv"))
    assert len(df) == 2
    assert np.isfinite(df["si_sdr"]).all()


@pytest.mark.slow
def test_train_snr_est_cli_smoke(dataset, tmp_path):
    from diffse_tpu.cli.train_snr_est import main

    ckpt_dir = str(tmp_path / "snr_run")
    main([
        "--base_dir", dataset, "--transform_type", "none",
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1",
        "--ckpt_dir", ckpt_dir, "--no_mesh",
    ])
    assert os.path.exists(os.path.join(ckpt_dir, "hparams.json"))

    from diffse_tpu.cli.eval_snr_est import main as snr_eval_main

    out_dir = str(tmp_path / "snr_eval")
    snr_eval_main([
        "--test_dir", os.path.join(dataset, "valid"),
        "--ckpt", ckpt_dir,
        "--destination_folder", out_dir,
    ])
    assert os.path.exists(os.path.join(out_dir, "_snr_est_results.txt"))


@pytest.mark.slow
def test_eval_cli_batched(dataset, tmp_path):
    """Bucketed batched eval path (--eval_batch_size > 1)."""
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "runb")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--no_mesh",
        *TINY_ARGS,
    ])
    from diffse_tpu.cli.eval import main as eval_main

    out_dir = str(tmp_path / "eval_batched")
    eval_main([
        "--destination_folder", out_dir,
        "--test_dir", os.path.join(dataset, "test"),
        "--ckpt", ckpt_dir,
        "--eval_batch_size", "2",
    ])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "_results.csv"))
    assert len(df) == 2
    assert np.isfinite(df["si_sdr"]).all()


@pytest.mark.slow
def test_eval_cli_packed_streaming(dataset, tmp_path):
    """Packed fleet serving (--eval_batch_size > 1 + --streaming_chunk_frames):
    chunks pooled across utterances into fixed-shape hot batches."""
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "runp")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--no_mesh",
        *TINY_ARGS,
    ])
    from diffse_tpu.cli.eval import main as eval_main

    out_dir = str(tmp_path / "eval_packed")
    eval_main([
        "--destination_folder", out_dir,
        "--test_dir", os.path.join(dataset, "test"),
        "--ckpt", ckpt_dir,
        "--eval_batch_size", "2",
        "--streaming_chunk_frames", "64",
    ])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "_results.csv"))
    assert len(df) == 2
    assert np.isfinite(df["si_sdr"]).all()

    # wav-mode packed streaming does not exist: argparse error.
    with pytest.raises(SystemExit):
        eval_main([
            "--destination_folder", str(tmp_path / "eval_packed_bad"),
            "--test_dir", os.path.join(dataset, "test"),
            "--ckpt", ckpt_dir,
            "--eval_batch_size", "2",
            "--streaming_chunk_frames", "64", "--streaming_mode", "wav",
        ])


@pytest.mark.slow
def test_eval_cli_seq_parallel(dataset, tmp_path):
    """Sequence-parallel eval path (--seq_shards): frames sharded over a
    4-device 'seq' mesh of the virtual CPU devices."""
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "runsq")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--no_mesh",
        *TINY_ARGS,
    ])
    from diffse_tpu.cli.eval import main as eval_main

    out_dir = str(tmp_path / "eval_seq")
    eval_main([
        "--destination_folder", out_dir,
        "--test_dir", os.path.join(dataset, "test"),
        "--ckpt", ckpt_dir,
        "--seq_shards", "4",
    ])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "_results.csv"))
    assert len(df) == 2
    assert np.isfinite(df["si_sdr"]).all()

    # Incompatible with the batched path: argparse error, not silent fallback.
    with pytest.raises(SystemExit):
        eval_main([
            "--destination_folder", str(tmp_path / "eval_seq_bad"),
            "--test_dir", os.path.join(dataset, "test"),
            "--ckpt", ckpt_dir,
            "--seq_shards", "4", "--eval_batch_size", "2",
        ])


@pytest.mark.slow
def test_deep_eval_cli_smoke(dataset, tmp_path):
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "rund")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--no_mesh",
        *TINY_ARGS,
    ])
    from diffse_tpu.cli.deep_eval import main as deep_main

    out_dir = str(tmp_path / "deep_out")
    deep_main([
        "--destination_folder", out_dir,
        "--test_dir", os.path.join(dataset, "valid2"),
        "--ckpt", ckpt_dir,
    ])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "_results_deep.csv"))
    assert len(df) == 2
    for snr in range(-5, 36, 5):
        assert f"si_sdr_{snr}" in df.columns
        assert np.isfinite(df[f"si_sdr_{snr}"]).all()
    assert os.path.exists(os.path.join(out_dir, "_avg_results_deep.txt"))


@pytest.mark.slow
def test_eval_cli_streaming(dataset, tmp_path):
    """Overlap-chunked streaming serving path (--streaming_chunk_frames)."""
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "runs")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--no_mesh",
        *TINY_ARGS,
    ])
    from diffse_tpu.cli.eval import main as eval_main

    out_dir = str(tmp_path / "eval_streamed")
    eval_main([
        "--destination_folder", out_dir,
        "--test_dir", os.path.join(dataset, "test"),
        "--ckpt", ckpt_dir,
        "--streaming_chunk_frames", "64",
        "--streaming_overlap_frames", "8",
    ])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "_results.csv"))
    assert len(df) == 2
    assert np.isfinite(df["si_sdr"]).all()


@pytest.mark.slow
def test_snr_adaptive_workflow_cli(dataset, tmp_path):
    """The full SNR-aligned workflow through the CLIs (README steps 2-4):
    train the SNR estimator, train sebridge_v3 + snr_conditioned=true with
    --snr_ckpt injected (in-training validation runs the estimator-driven
    1-NFE inference branch), then eval with --snr_ckpt (estimated SNR)."""
    from diffse_tpu.cli.train_snr_est import main as snr_main

    snr_dir = str(tmp_path / "snr")
    snr_main([
        "--base_dir", dataset, "--transform_type", "none",
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1",
        "--ckpt_dir", snr_dir, "--no_mesh",
    ])

    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "v3snr")
    main([
        "--backbone", "ncsnpp", "--modeltype", "sebridge_v3",
        "--snr_conditioned", "true", "--fixed_snr", "0.17783",
        "--sigma-max", "1.0", "--transform_type", "exponent",
        "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1",
        "--num_eval_files", "1", "--snr_ckpt", snr_dir,
        "--ckpt_dir", ckpt_dir, "--no_mesh",
        *TINY_ARGS,
    ])
    with open(os.path.join(ckpt_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert np.isfinite(meta["0"]["pesq"])  # estimator-driven validation ran

    from diffse_tpu.cli.eval import main as eval_main

    out_dir = str(tmp_path / "eval_est_snr")
    eval_main([
        "--destination_folder", out_dir,
        "--test_dir", os.path.join(dataset, "test"),
        "--ckpt", ckpt_dir,
        "--snr_ckpt", snr_dir,
    ])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "_results.csv"))
    assert len(df) == 2
    assert np.isfinite(df["si_sdr"]).all()


@pytest.mark.slow
def test_train_cli_tensor_parallel(dataset, tmp_path):
    """--tp_size 2 trains over a (4, 2) data x model mesh on the 8 virtual
    devices; the checkpointed params must be finite and gatherable."""
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "tp_run")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "4", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--tp_size", "2", "--seed", "0",
        *TINY_ARGS,
    ])
    assert os.path.exists(os.path.join(ckpt_dir, "metadata.json"))
    with open(os.path.join(ckpt_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert np.isfinite(meta["0"]["valid_loss"])


@pytest.mark.slow
def test_serve_cli_smoke(dataset, tmp_path):
    """train -> serve CLI -> HTTP enhance round trip on the checkpoint."""
    import urllib.request

    from diffse_tpu.cli.serve import main as serve_main
    from diffse_tpu.cli.train import main
    from diffse_tpu.data.wavio import parse_wav, wav_bytes

    ckpt_dir = str(tmp_path / "srun")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1", "--num_eval_files", "0",
        "--ckpt_dir", ckpt_dir, "--no_mesh", "--seed", "0",
        *TINY_ARGS,
    ])

    server, service, thread = serve_main(
        ["--ckpt", ckpt_dir, "--port", "0", "--max_wait_ms", "10"], block=False)
    host, port = server.server_address[:2]
    try:
        rng = np.random.default_rng(0)
        y = rng.standard_normal(4000).astype(np.float32) * 0.1
        req = urllib.request.Request(
            f"http://{host}:{port}/enhance", data=wav_bytes(y, 16000, "float32"),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out, sr = parse_wav(r.read())
        assert sr == 16000 and out.shape == (1, 4000)
        assert np.all(np.isfinite(out))
    finally:
        server.shutdown()
        thread.join(timeout=10)
        service.close()


@pytest.mark.slow
def test_export_artifact_cli(dataset, tmp_path):
    """tools/export_artifact.py: checkpoint -> multi-bucket AOT artifact ->
    framework-free loader round trip."""
    from diffse_tpu.cli.train import main

    ckpt_dir = str(tmp_path / "run_exp")
    main([
        "--backbone", "ncsnpp", "--sde", "bbed", "--modeltype", "sebridge_v2",
        "--snr_conditioned", "false", "--base_dir", dataset,
        "--batch_size", "2", "--num_frames", "32", "--num_workers", "1",
        "--max_epochs", "1", "--max_steps_per_epoch", "1",
        "--num_eval_files", "0", "--ckpt_dir", ckpt_dir, "--no_mesh",
        *TINY_ARGS,
    ])

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from export_artifact import main as export_main

    art = str(tmp_path / "artifact")
    rc = export_main(["--ckpt", ckpt_dir, "--out", art,
                      "--utt_seconds", "0.3", "1.0",
                      "--platforms", "cpu"])
    assert rc == 0

    from diffse_tpu.serving.export import load_artifact

    enhance, meta = load_artifact(art)
    assert meta["branch"] == "sebridge_v2"
    assert len(meta["buckets"]) == 2
    y = (np.random.default_rng(0).standard_normal(9000) * 0.1).astype(
        np.float32)
    out = enhance(y, seed=3)
    assert out.shape == (9000,) and np.isfinite(out).all()
