"""End-to-end slice: synthetic dataset -> train epoch -> validation metrics ->
checkpoint -> enhance -> wav out. Exercises L0-L6 once (SURVEY.md §7 step 5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.data.dataset import DataModuleConfig, SpecsDataModule
from diffse_tpu.data.synthetic import make_synthetic_dataset
from diffse_tpu.data.wavio import read_wav
from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.train.loop import train_score_model, train_snr_model
from diffse_tpu.train.logging import MetricsLogger

# Small-but-real NCSN++: full 256-bin frequency axis, 5 levels so the
# bottleneck attention stays cheap, nf=4.
E2E_BACKBONE = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                    attn_resolutions=(16,), image_size=256)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vbd_synth"))
    return make_synthetic_dataset(root, num_train=4, num_valid=2, num_valid2=2,
                                  num_test=2, duration_s=1.0)


def test_synthetic_dataset_layout(dataset):
    for subset in ("train", "valid", "valid2", "test"):
        assert os.path.isdir(os.path.join(dataset, subset, "clean"))
        assert os.path.isdir(os.path.join(dataset, subset, "noisy"))
    assert os.path.exists(os.path.join(dataset, "valid", "active_rms.txt"))
    x, sr = read_wav(os.path.join(dataset, "train", "clean", "ptr_000.wav"))
    assert sr == 16000 and x.shape[0] == 1


def test_dataset_crop_contract(dataset):
    from diffse_tpu.data.dataset import Specs, Specs_SNR

    ds = Specs(dataset, "train", dummy=False, shuffle_spec=True, num_frames=64,
               hop_length=128, fixed_snr=0.5, seed=0)
    x, y = ds[0]
    assert x.shape == y.shape == ((64 - 1) * 128,)

    ds_snr = Specs_SNR(dataset, "valid", dummy=False, shuffle_spec=False,
                       num_frames=64, hop_length=128)
    x, y, s, n = ds_snr[0]
    assert s > 0 and n > 0


@pytest.mark.slow
def test_e2e_train_validate_checkpoint_enhance(dataset, tmp_path):
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="sebridge_v2",
        snr_conditioned="false", sigma_max=1.0, num_frames=64,
        num_eval_files=1, lr=1e-3,
    )
    model = ScoreModel(
        cfg, backbone_kwargs=E2E_BACKBONE,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    dm = SpecsDataModule(DataModuleConfig(
        base_dir=dataset, batch_size=2, num_frames=64, num_workers=1,
    ))

    ckpt_dir = str(tmp_path / "ckpts")
    state = train_score_model(
        model, dm, max_epochs=1, ckpt_dir=ckpt_dir,
        logger=MetricsLogger(), use_mesh=False, max_steps_per_epoch=2,
    )
    assert int(state.step) == 2

    # checkpoint was written with metrics
    from diffse_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 0

    # enhance a test utterance with the EMA weights
    from diffse_tpu.train.state import eval_variables

    ev = eval_variables(state)
    x, _ = read_wav(os.path.join(dataset, "test", "clean", "pte_000.wav"))
    y, _ = read_wav(os.path.join(dataset, "test", "noisy", "pte_000.wav"))
    x_hat, nfe, rtf = model.enhance(
        ev, jnp.asarray(x), jnp.asarray(y), key=jax.random.PRNGKey(0), timeit=True
    )
    assert x_hat.shape == (x.shape[1],)
    assert np.all(np.isfinite(x_hat))
    assert nfe == 1 and rtf > 0


def test_train_loop_accepts_preinitialized_variables(dataset):
    """train_score_model(variables=...) must use the injected tree verbatim
    (the host-CPU-init path used for large models on the TPU bridge)."""
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="sebridge_v2",
        snr_conditioned="false", sigma_max=1.0, num_frames=64,
        num_eval_files=0,
    )
    model = ScoreModel(
        cfg, backbone_kwargs=E2E_BACKBONE,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    dm = SpecsDataModule(DataModuleConfig(
        base_dir=dataset, batch_size=2, num_frames=64, num_workers=1,
    ))
    variables0 = model.init_variables(jax.random.PRNGKey(123))
    state = train_score_model(
        model, dm, max_epochs=1, ckpt_dir=None, logger=MetricsLogger(),
        use_mesh=False, max_steps_per_epoch=0, variables=variables0,
    )
    assert int(state.step) == 0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.variables["params"], variables0["params"],
    )


@pytest.mark.slow
def test_e2e_snr_estimator_training(dataset, tmp_path):
    from diffse_tpu.models.snr_model import SNRModel, SNRModelConfig

    model = SNRModel(SNRModelConfig(num_frames=64))
    dm = SpecsDataModule(DataModuleConfig(
        base_dir=dataset, batch_size=2, num_frames=64, num_workers=1,
        transform_type="none",
    ))
    state = train_snr_model(
        model, dm, max_epochs=1, ckpt_dir=str(tmp_path / "snr_ckpts"),
        use_mesh=False, max_steps_per_epoch=2,
    )
    assert int(state.step) == 2

    # estimate SNR from a wav
    from diffse_tpu.train.state import eval_variables

    y, _ = read_wav(os.path.join(dataset, "valid", "noisy", "pva_000.wav"))
    est = model.estimate_from_wav(eval_variables(state), jnp.asarray(y))
    assert est.shape == (1,) and np.isfinite(float(est[0]))
