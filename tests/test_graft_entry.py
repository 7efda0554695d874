"""Driver entry-point hardening tests.

The driver may invoke __graft_entry__ in an environment whose ambient JAX
platform is broken (round 1/2: a libtpu-version-mismatched TPU client where
ANY eager op raises). These tests run the entry points in a subprocess whose
JAX_PLATFORMS names a nonexistent platform — so any in-process backend
initialization or eager op fails loudly — and assert both hooks still work
(they must isolate all real work into JAX_PLATFORMS=cpu subprocesses).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_broken_env(code: str, timeout=900):
    env = dict(os.environ)
    # a platform that cannot initialize: any backend touch in-process raises
    env["JAX_PLATFORMS"] = "bogus_platform"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["XLA_FLAGS"] = ""
    return subprocess.run(
        [sys.executable, "-c", f"import sys; sys.path.insert(0, {REPO!r})\n" + code],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_survives_broken_ambient_platform():
    res = _run_in_broken_env(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(4)\n"
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ok, train_loss=" in res.stdout + res.stderr


@pytest.mark.slow
def test_entry_survives_broken_ambient_platform():
    res = _run_in_broken_env(
        "import numpy as np\n"
        "import __graft_entry__ as g\n"
        "fn, (variables, x, t, y) = g.entry()\n"
        "import jax\n"
        "leaves = jax.tree_util.tree_leaves(variables)\n"
        "assert all(isinstance(l, np.ndarray) for l in leaves), 'non-numpy leaf'\n"
        "assert isinstance(x, np.ndarray) and isinstance(t, np.ndarray)\n"
        "print('entry-ok', len(leaves))\n"
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "entry-ok" in res.stdout
