"""Data pipeline tests: dataset contract, loader batching, on-device
prepare_batch parity with the reference's host-side chain."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffse_tpu.data.dataset import DataLoader, DataModuleConfig, Specs, SpecsDataModule
from diffse_tpu.data.synthetic import make_synthetic_dataset
from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    return make_synthetic_dataset(root, num_train=5, num_valid=2, num_valid2=2,
                                  num_test=2, duration_s=0.8)


def test_fixed_snr_remix(dataset):
    ds1 = Specs(dataset, "train", dummy=False, shuffle_spec=False, num_frames=32,
                hop_length=128, fixed_snr=1.0)
    ds0 = Specs(dataset, "train", dummy=False, shuffle_spec=False, num_frames=32,
                hop_length=128, fixed_snr=0.0)
    x1, y1 = ds1[0]
    x0, y0 = ds0[0]
    np.testing.assert_allclose(x0, x1)
    np.testing.assert_allclose(y0, x0, atol=1e-7)  # fixed_snr=0 -> y == x
    assert not np.allclose(y1, x1)


def test_dataloader_batching_and_drop_last(dataset):
    ds = Specs(dataset, "train", dummy=False, shuffle_spec=False, num_frames=32,
               hop_length=128)
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == len(ds) // 2 == len(dl)
    x, y = batches[0]
    assert x.shape == (2, 31 * 128) and y.shape == (2, 31 * 128)


def test_dataloader_shuffle_reproducible(dataset):
    ds = Specs(dataset, "train", dummy=False, shuffle_spec=False, num_frames=32,
               hop_length=128)
    a = [b[0].sum() for b in DataLoader(ds, 2, shuffle=True, seed=1)]
    b = [b[0].sum() for b in DataLoader(ds, 2, shuffle=True, seed=1)]
    np.testing.assert_allclose(a, b)


def test_data_module_setup(dataset):
    dm = SpecsDataModule(DataModuleConfig(base_dir=dataset, batch_size=2,
                                          num_frames=32))
    dm.setup()
    assert len(dm.train_set) == 5
    assert len(dm.valid_set) == 2
    assert len(dm.valid_set_2) == 2
    assert len(dm.test_set) == 2
    assert len(dm.valid_set.clean_rms) >= 2


def test_prepare_batch_matches_reference_chain(dataset):
    """On-device normalize->STFT->spec_fwd == the reference's host-side chain
    (data_module.py:70-84) computed with torch."""
    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed", sigma_max=0.5,
                           num_frames=32)
    model = ScoreModel(cfg, backbone_kwargs=dict(nf=8, ch_mult=(1,), image_size=8),
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30))
    ds = Specs(dataset, "train", dummy=False, shuffle_spec=False, num_frames=32,
               hop_length=128)
    x, y = ds[0]
    X, Y = model.prepare_batch((jnp.asarray(x)[None], jnp.asarray(y)[None]))

    # torch reference chain
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    normfac = yt.abs().max()
    xt, yt = xt / normfac, yt / normfac
    w = torch.hann_window(510, periodic=True)
    Xt = torch.stft(xt, n_fft=510, hop_length=128, window=w, center=True,
                    return_complex=True)
    Xt = Xt.abs() ** 0.5 * torch.exp(1j * Xt.angle()) * 0.15

    np.testing.assert_allclose(np.asarray(X)[0, 0], Xt.numpy(), atol=2e-4)


def test_parallel_loader_matches_sequential(dataset):
    """num_workers>1 must yield bit-identical batches to the single-worker
    path when the dataset crops deterministically (shuffle_spec=False)."""
    ds = Specs(dataset, "train", dummy=False, shuffle_spec=False, num_frames=32,
               hop_length=128)
    seq = list(DataLoader(ds, 2, shuffle=False, num_workers=1))
    par = list(DataLoader(ds, 2, shuffle=False, num_workers=4))
    assert len(seq) == len(par)
    for (xs, ys), (xp, yp) in zip(seq, par):
        np.testing.assert_array_equal(xs, xp)
        np.testing.assert_array_equal(ys, yp)


def test_parallel_loader_random_crops_deterministic(dataset):
    """With shuffle_spec=True the parallel loader pre-draws crop u's from its
    own seeded rng: two runs with the same seed are identical."""
    def run():
        ds = Specs(dataset, "train", dummy=False, shuffle_spec=True,
                   num_frames=16, hop_length=128, seed=7)
        return [b for b in DataLoader(ds, 2, shuffle=True, num_workers=4, seed=3)]

    a, b = run(), run()
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_dummy_flag(dataset):
    ds = Specs(dataset, "train", dummy=True, shuffle_spec=False, num_frames=32,
               hop_length=128)
    assert len(ds) == int(5 / 200)  # == 0, the reference's 200x shrink contract
