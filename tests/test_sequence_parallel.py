"""Sequence (frames)-parallel enhancement: sharded program == single-device.

The reference serves one utterance on one GPU (sgmse utils.py:79-86 pad-to-64
is its only length tool); frames-parallel enhancement is the beyond-reference
TPU scaling path. GSPMD partitioning is semantics-preserving, so the sharded
program must agree with the unsharded one to float tolerance — that is the
contract these tests pin down (on the conftest's 8 virtual CPU devices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.parallel import constrain_frames, make_seq_mesh, spec_seq_sharding

TINY_BACKBONE = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                     attn_resolutions=(16,), image_size=256)


def _make_model(model_type="sebridge_v2"):
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type=model_type,
        snr_conditioned="false", sigma_max=1.0, num_frames=64,
    )
    model = ScoreModel(
        cfg, backbone_kwargs=TINY_BACKBONE,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    variables = model.init_variables(jax.random.PRNGKey(7))
    return model, variables


def _wavs(seed=0, n=12000):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, n)).astype(np.float32) * 0.1
    y = x + rng.standard_normal((1, n)).astype(np.float32) * 0.05
    return jnp.asarray(x), jnp.asarray(y)


def test_seq_mesh_and_sharding_shapes():
    mesh = make_seq_mesh()
    assert mesh.axis_names == ("seq",)
    assert mesh.devices.size == len(jax.devices())

    sub = make_seq_mesh(n_seq=4)
    assert sub.devices.size == 4
    with pytest.raises(ValueError):
        make_seq_mesh(n_seq=10**6)

    spec = jnp.zeros((1, 1, 256, 64), jnp.complex64)
    sharded = jax.device_put(spec, spec_seq_sharding(mesh))
    n = mesh.devices.size
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(1, 1, 256, 64 // n)}


def test_constrain_frames_inside_jit():
    mesh = make_seq_mesh()
    n = mesh.devices.size

    @jax.jit
    def f(x):
        return constrain_frames(x * 2.0, mesh)

    out = f(jnp.ones((2, 3, 16, 8 * n)))
    assert np.allclose(np.asarray(out), 2.0)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, 3, 16, 8)}


def test_enhance_seq_parallel_matches_single_device_1nfe():
    model, variables = _make_model("sebridge_v2")
    x, y = _wavs()
    key = jax.random.PRNGKey(3)

    ref = model.enhance(variables, x, y, key=key)
    mesh = make_seq_mesh()
    par = model.enhance(variables, x, y, key=key, seq_mesh=mesh)

    assert par.shape == ref.shape
    np.testing.assert_allclose(par, ref, rtol=1e-4, atol=1e-5)


def test_enhance_seq_parallel_matches_single_device_pc_scan():
    """The 30-step PC branch runs the whole reverse SDE as one lax.scan; the
    frames constraint must propagate through every scan iteration."""
    model, variables = _make_model("bbed")
    x, y = _wavs(seed=1)
    key = jax.random.PRNGKey(11)

    ref = model.enhance(variables, x, y, key=key, sampler_type="pc", N=3)
    mesh = make_seq_mesh(n_seq=4)
    par = model.enhance(variables, x, y, key=key, sampler_type="pc", N=3,
                        seq_mesh=mesh)

    assert par.shape == ref.shape
    # Reduction-order noise (GN stats psum'd across shards) compounds over
    # the scan steps: bound the error relative to the signal scale.
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(par / scale, ref / scale, atol=5e-3)


def test_enhance_seq_mesh_cache_key_distinct():
    """seq_mesh participates in the enhance jit cache key: the sharded and
    unsharded programs must not collide in the bucket cache."""
    model, variables = _make_model("sebridge_v2")
    x, y = _wavs(seed=2)
    _ = model.enhance(variables, x, y)
    n0 = len(model._enhance_cache)
    _ = model.enhance(variables, x, y, seq_mesh=make_seq_mesh())
    assert len(model._enhance_cache) == n0 + 1
    _ = model.enhance(variables, x, y, seq_mesh=make_seq_mesh())
    assert len(model._enhance_cache) == n0 + 1  # same mesh -> cache hit


def test_enhance_honors_custom_axis_name():
    """make_seq_mesh exposes axis_name; enhance(seq_mesh=...) must shard over
    the mesh's actual axis rather than assuming it is called 'seq'."""
    model, variables = _make_model("sebridge_v2")
    x, y = _wavs(seed=4)
    key = jax.random.PRNGKey(9)
    ref = model.enhance(variables, x, y, key=key)
    mesh = make_seq_mesh(n_seq=4, axis_name="frames")
    par = model.enhance(variables, x, y, key=key, seq_mesh=mesh)
    np.testing.assert_allclose(par, ref, rtol=1e-4, atol=1e-5)
