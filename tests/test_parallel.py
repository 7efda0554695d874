"""Tests for diffse_tpu.parallel.mesh: initialize_distributed failure policy.

A configured-but-broken coordinator must raise (not silently degrade to
single-process); the no-coordinator case must degrade gracefully.
"""

import jax
import pytest

from diffse_tpu.parallel import mesh as mesh_mod


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
