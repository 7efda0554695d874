"""Bucketed batch-enhancement tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.evaluation.batch_eval import batch_enhance, iter_buckets, width_bucket
from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig

TINY_BACKBONE = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                     attn_resolutions=(16,), image_size=256)


def test_width_bucket():
    assert width_bucket(8063) == 64  # 63 frames -> 64
    assert width_bucket(8064) == 64  # 64 frames -> 64
    assert width_bucket(8192) == 128  # 65 frames -> 128


def test_iter_buckets_groups_by_width():
    lengths = [8000, 8050, 9000, 20000, 20100]
    batches = list(iter_buckets(lengths, batch_size=2))
    # 8000/8050/9000 share bucket 64; 20000/20100 share bucket 192
    widths = [w for w, _ in batches]
    assert widths == sorted(widths)
    all_idxs = [i for _, idxs in batches for i in idxs]
    assert sorted(all_idxs) == list(range(5))
    for _, idxs in batches:
        assert len(idxs) <= 2


def test_batch_enhance_end_to_end(rng):
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge_v2",
                           snr_conditioned="false", sigma_max=1.0, num_frames=32)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=32)

    lengths = [4000, 4100, 9000]
    xs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lengths]
    ys = [x + rng.standard_normal(x.shape[0]).astype(np.float32) * 0.03 for x in xs]

    outs = batch_enhance(model, variables, xs, ys, "sebridge_v2",
                         jax.random.PRNGKey(1), batch_size=2)
    assert len(outs) == 3
    for o, n in zip(outs, lengths):
        assert o.shape == (n,)
        assert np.all(np.isfinite(o))


def test_batch_enhance_with_mesh(rng):
    """Eval fan-out over the 8-virtual-device mesh (data-parallel sharding)."""
    from diffse_tpu.parallel import make_mesh, replicate

    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge_v2",
                           snr_conditioned="false", sigma_max=1.0, num_frames=32)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=32)

    mesh = make_mesh()
    variables_r = replicate(mesh, variables)
    lengths = [4000] * 8
    xs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lengths]
    ys = [x + rng.standard_normal(x.shape[0]).astype(np.float32) * 0.03 for x in xs]
    outs = batch_enhance(model, variables_r, xs, ys, "sebridge_v2",
                         jax.random.PRNGKey(1), batch_size=8, mesh=mesh)
    assert len(outs) == 8
    for o in outs:
        assert np.all(np.isfinite(o))


def test_evaluate_model_batched_matches_per_file(tmp_path, rng):
    """evaluate_model(batch_size>1) routes through bucketed batch_enhance
    with identical per-row semantics: on a deterministic branch the metric
    triple must match the per-file path."""
    from diffse_tpu.data.dataset import DataModuleConfig, SpecsDataModule
    from diffse_tpu.data.synthetic import make_synthetic_dataset
    from diffse_tpu.evaluation.inference import evaluate_model

    root = make_synthetic_dataset(str(tmp_path / "d"), num_train=2, num_valid=3,
                                  num_valid2=2, num_test=2, duration_s=0.6)
    dm = SpecsDataModule(DataModuleConfig(base_dir=root, batch_size=2,
                                          num_frames=32, num_workers=1))
    dm.setup("fit")
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", model_type="sebridge",
                           snr_conditioned="false", sigma_max=1.0, num_frames=32)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=32)

    ref = evaluate_model(model, variables, dm, num_eval_files=3,
                         model_type="sebridge", key=jax.random.PRNGKey(7))
    bat = evaluate_model(model, variables, dm, num_eval_files=3,
                         model_type="sebridge", key=jax.random.PRNGKey(7),
                         batch_size=2)
    np.testing.assert_allclose(bat, ref, rtol=1e-4, atol=1e-4)
