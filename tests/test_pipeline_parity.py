"""Full-pipeline waveform parity against the EXECUTING torch reference.

Runs the reference's own ``ScoreModel.enhance`` (sgmse/model.py:702-839) on
CPU — with its JIT CUDA op stubbed by exact CPU semantics, the heavyweight
deps (pytorch_lightning / torch_ema / torchaudio / pesq / pystoi) replaced by
minimal stubs, and the module-global CUDA checkpoint load neutralized — and
asserts that OUR production enhance path produces the SAME enhanced
*waveform* when both consume identical Gaussian draws:

  - ``bbed`` 30-step predictor-corrector sampling (model.py:753-770 vs our
    jitted ``_enhance_jit('bbed_pc')`` single-scan sampler), and
  - ``sebridge_v3`` + ``snr_conditioned='true'`` 1-NFE consistency inference
    with an oracle SNR (model.py:810-828 incl. the Karras snap + Eq. 12
    normalization, vs our ``sebridge_v3_snr`` branch).

Noise injection: our sampler's draws are deterministic functions of the
enhance PRNG key (utils.randn_like with torch complex-randn semantics); the
test replays the exact key schedule eagerly, then monkeypatches
``torch.randn_like`` so the reference consumes the same values in its draw
order (prior, then per step corrector/predictor — sampling/__init__.py:54-75,
predictors.py:70-80, correctors.py:59-81).

The utterance length is chosen so frames is already a multiple of 64: both
implementations' pad_spec is then a no-op, removing the one deliberate
padding-strategy difference (the reference zero-pads spec FRAMES after the
STFT, utils.py:79-86; we zero-pad the waveform before it).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffse_tpu.models.ncsnpp import NCSNpp
from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.utils import randn_like

_REF_ROOT = "/root/reference/sgmse-bbed"
_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)

# small-but-full-height config: F=256 (the STFT contract), 5 levels,
# attention at 16 — every architectural feature on the enhance path is live.
ARCH = dict(nf=4, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
            attn_resolutions=(16,), image_size=256)
HOP = 128
T_ORIG = 63 * HOP  # frames = 1 + T//hop = 64 -> pad_spec no-op on both sides


def _load_converter():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_torch_checkpoint",
        os.path.join(_TOOLS, "convert_torch_checkpoint.py"),
    )
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)
    return conv


@pytest.fixture(scope="module")
def ref_env():
    """Import the reference sgmse.model on CPU with all stubs installed.

    Yields a namespace with the reference classes; restores the torch patches
    and removes the stub modules at teardown so they cannot leak into other
    test modules (e.g. a stub `pesq` must never shadow wheel detection in
    diffse_tpu.evaluation.metrics — which we import FIRST to pin its lazy
    binding).
    """
    if not os.path.isdir(_REF_ROOT):
        pytest.skip("reference repo not present")

    import diffse_tpu.evaluation.metrics  # noqa: F401  (pin _pesq binding)

    installed = []

    def install(name, mod):
        if name not in sys.modules:
            sys.modules[name] = mod
            installed.append(name)

    # ---- dependency stubs (only what class definition + enhance touch)
    pl = types.ModuleType("pytorch_lightning")

    class _LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        @classmethod
        def load_from_checkpoint(cls, *a, **k):
            # neutralizes the module-global SNR-estimator CUDA load at
            # sgmse/model.py:25-30 (a documented reference quirk)
            return torch.nn.Module()

    class _LightningDataModule:
        def __init__(self, *a, **k):
            pass

    pl.LightningModule = _LightningModule
    pl.LightningDataModule = _LightningDataModule
    install("pytorch_lightning", pl)

    te = types.ModuleType("torch_ema")

    class _EMA:
        def __init__(self, params, decay=0.999):
            self.decay = decay
            self.collected_params = None

        def update(self, *a, **k):
            pass

        def store(self, *a, **k):
            pass

        def copy_to(self, *a, **k):
            pass

        def restore(self, *a, **k):
            pass

        def to(self, *a, **k):
            return self

        def state_dict(self):
            return {}

        def load_state_dict(self, sd):
            pass

    te.ExponentialMovingAverage = _EMA
    install("torch_ema", te)

    ta = types.ModuleType("torchaudio")
    ta.load = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
    install("torchaudio", ta)

    pesq_mod = types.ModuleType("pesq")
    pesq_mod.pesq = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
    install("pesq", pesq_mod)
    pystoi_mod = types.ModuleType("pystoi")
    pystoi_mod.stoi = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
    install("pystoi", pystoi_mod)

    # ---- exact-CPU stub for the reference's JIT-compiled CUDA op module
    op_name = "sgmse.backbones.ncsnpp_utils.op"
    if op_name not in sys.modules:
        from diffse_tpu.ops.upfirdn2d import upfirdn2d_numpy

        op_mod = types.ModuleType(op_name)

        def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
            out = upfirdn2d_numpy(
                input.detach().cpu().double().numpy(),
                kernel.detach().cpu().double().numpy(),
                up=up, down=down, pad=(int(pad[0]), int(pad[1])),
            )
            return torch.from_numpy(out).to(input.dtype)

        def fused_leaky_relu(inp, bias, negative_slope=0.2, scale=2**0.5):
            shape = [1, -1] + [1] * (inp.ndim - 2)
            return torch.nn.functional.leaky_relu(
                inp + bias.view(*shape), negative_slope
            ) * scale

        class FusedLeakyReLU(torch.nn.Module):
            def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
                super().__init__()
                self.bias = torch.nn.Parameter(torch.zeros(channel))
                self.negative_slope = negative_slope
                self.scale = scale

            def forward(self, inp):
                return fused_leaky_relu(
                    inp, self.bias, self.negative_slope, self.scale
                )

        op_mod.upfirdn2d = upfirdn2d
        op_mod.fused_leaky_relu = fused_leaky_relu
        op_mod.FusedLeakyReLU = FusedLeakyReLU
        install(op_name, op_mod)

    # ---- make every .cuda()/.to('cuda') a no-op (the reference's enhance
    # hard-codes them, model.py:716,724,742-743)
    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    orig_module_to = torch.nn.Module.to

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    def _safe_to(self, *args, **kwargs):
        args = tuple(
            a for a in args
            if not (isinstance(a, (str, torch.device)) and "cuda" in str(a))
        )
        if "cuda" in str(kwargs.get("device", "")):
            kwargs.pop("device")
        if not args and not kwargs:
            return self
        return orig_module_to(self, *args, **kwargs)

    torch.nn.Module.to = _safe_to

    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)

    try:
        import sgmse.data_module as ref_dm
        import sgmse.model as ref_model_mod
        import sgmse.sdes as ref_sdes

        # The reference's BBED._std round-trips through host numpy expi and
        # returns float64 (sdes.py:287-293). Under its pinned torch 1.10 the
        # complex*double promotion kept the complex64 value type; modern
        # torch promotes to complex128 and the float32 convs reject it. Cast
        # the std back to float32 to reproduce the 1.10-era numerics.
        _orig_std = ref_sdes.BBED._std
        ref_sdes.BBED._std = lambda self, t: _orig_std(self, t).to(torch.float32)
        # PROPOSED_1._std has the identical host-expi float64 promotion
        # (sdes.py:369-376); same 1.10-era cast.
        _orig_std_p1 = ref_sdes.PROPOSED_1._std
        ref_sdes.PROPOSED_1._std = (
            lambda self, t: _orig_std_p1(self, t).to(torch.float32)
        )

        yield types.SimpleNamespace(
            ScoreModel=ref_model_mod.ScoreModel,
            SpecsDataModule=ref_dm.SpecsDataModule,
            model_mod=ref_model_mod,
        )
    finally:
        try:
            sys.modules["sgmse.sdes"].BBED._std = _orig_std
            sys.modules["sgmse.sdes"].PROPOSED_1._std = _orig_std_p1
        except Exception:
            pass
        torch.Tensor.cuda = orig_tensor_cuda
        torch.nn.Module.cuda = orig_module_cuda
        torch.nn.Module.to = orig_module_to
        for name in installed:
            sys.modules.pop(name, None)


def _build_pair(ref_env, model_type, snr_conditioned, fixed_snr=1.0,
                sigma_max=1.0, seed=0, sde="bbed", sde_kwargs=None,
                loss_type="mse"):
    """Our ScoreModel (random flax init) + the reference ScoreModel loaded
    with the CONVERTED identical weights.

    ``sde_kwargs`` are the SDE's constructor kwargs (identical names on both
    sides — the registries mirror each other); default is the production BBED
    configuration. The reference ctor splats them through **kwargs to its
    SDERegistry lookup (sgmse/model.py:78-79)."""
    conv = _load_converter()
    sde_kwargs = dict(
        sde_kwargs or dict(T_sampling=0.999, k=2.6, theta=0.52)
    )

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde=sde, model_type=model_type,
        snr_conditioned=snr_conditioned, fixed_snr=fixed_snr,
        sigma_max=sigma_max, t_eps=3e-2, loss_type=loss_type,
    )
    ours = ScoreModel(
        cfg, backbone_kwargs=ARCH, sde_kwargs=dict(sde_kwargs, N=30),
    )
    variables = ours.init_variables(jax.random.PRNGKey(seed), num_frames=64)

    corr = conv.ncsnpp_correspondence(**ARCH)
    sd = conv.convert_flax_to_state_dict(
        jax.tree_util.tree_map(np.asarray, variables["params"]), corr
    )
    sd = {k[len("dnn."):]: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    # the reference reads kwargs['sigma_max'] unconditionally (model.py:80);
    # an SDE's own sigma_max (when present in sde_kwargs) takes precedence.
    ref_kwargs = {"sigma_max": sigma_max, **sde_kwargs}
    ref = ref_env.ScoreModel(
        backbone="ncsnpp", sde=sde, model_type=model_type,
        snr_conditioned=snr_conditioned, fixed_snr=fixed_snr,
        loss_type=loss_type, data_module_cls=ref_env.SpecsDataModule,
        base_dir="", batch_size=1, num_workers=0, gpus=0,
        **ref_kwargs, **ARCH,
    )
    missing, unexpected = ref.dnn.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    ref.eval()  # EMA stub no-ops; dropout is 0.0 in this config anyway
    return ours, variables, ref


def _wav_pair(seed=1):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(T_ORIG) * 0.1).astype(np.float32)
    y = (x + rng.standard_normal(T_ORIG).astype(np.float32) * 0.05).astype(
        np.float32
    )
    return x, y


def _spec_shape():
    return (1, 1, 256, 64)


def _inject_torch_noise(monkeypatch, draws):
    """Make torch.randn_like consume `draws` (numpy complex64) in order."""
    seq = iter(list(draws))

    def fake_randn_like(x, *a, **k):
        d = torch.from_numpy(np.asarray(next(seq)))
        assert tuple(d.shape) == tuple(x.shape), (d.shape, x.shape)
        return d.to(x.dtype)

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    return seq


def _replay_pc_draws(key, n_steps):
    """Replay OUR pc sampler's key schedule (sampling/__init__.py:111-129):
    prior draw from split(key)[0], then per scan step k,kc,kp = split(k,3)
    with corrector noise from fold_in(kc, 0) and predictor noise from kp."""
    dummy = jnp.zeros(_spec_shape(), jnp.complex64)
    draws = []
    prior_key, k = jax.random.split(key)
    draws.append(np.asarray(randn_like(prior_key, dummy)))
    for _ in range(n_steps):
        k, kc, kp = jax.random.split(k, 3)
        draws.append(np.asarray(randn_like(jax.random.fold_in(kc, 0), dummy)))
        draws.append(np.asarray(randn_like(kp, dummy)))
    return draws


def _rel_err(ref_wav, our_wav):
    err = float(np.max(np.abs(our_wav - ref_wav)) / np.max(np.abs(ref_wav)))
    print(f"waveform max relative deviation: {err:.3e}")
    return err


@pytest.mark.slow
def test_bbed_pc_enhance_waveform_parity(ref_env, monkeypatch):
    """30-step BBED PC enhancement: identical noise -> identical waveform.

    Covers the entire inference stack at once: max-abs normalization, STFT +
    exponent compression (data_module.py:241-297), the prior sample, 30x
    (ald corrector + reverse-diffusion predictor) with the BBED reverse
    discretization (sdes.py:282-304), the denoise-final convention, spec_back
    + iSTFT, and the norm-factor undo (model.py:742-833)."""
    ours, variables, ref = _build_pair(ref_env, "bbed", "false")
    x, y = _wav_pair()
    key = jax.random.PRNGKey(7)

    our_wav = ours.enhance(variables, x[None], y[None], key=key, N=30)

    draws = _replay_pc_draws(key, n_steps=30)
    _inject_torch_noise(monkeypatch, draws)
    with torch.no_grad():
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None], N=30
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 1e-4, f"waveform relative deviation {err:.2e}"


@pytest.mark.slow
def test_sebridge_v3_snr_oracle_enhance_waveform_parity(ref_env, monkeypatch):
    """1-NFE SNR-adaptive consistency inference with an oracle SNR: the
    Karras-grid snap, Eq. 12 norm-factor correction, X_T = Y + Z*sigma_max*t,
    and the c_skip/c_out parameterization (model.py:810-828, 481-543) must
    produce the same waveform as our sebridge_v3_snr branch."""
    ours, variables, ref = _build_pair(
        ref_env, "sebridge_v3", "true", fixed_snr=0.17783, sigma_max=1.0
    )
    x, y = _wav_pair(seed=2)
    key = jax.random.PRNGKey(11)
    noise_rms, clean_rms = 0.3, 1.0

    our_wav = ours.enhance(
        variables, x[None], y[None], key=key,
        oracle=True, clean_rms=clean_rms, noise_rms=noise_rms,
    )

    # our branch draws once: randn_like(key, Y) (score_model.py:573-578)
    dummy = jnp.zeros(_spec_shape(), jnp.complex64)
    _inject_torch_noise(monkeypatch, [np.asarray(randn_like(key, dummy))])
    with torch.no_grad():
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None],
            oracle=True, clean_rms=clean_rms, noise_rms=noise_rms,
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 1e-4, f"waveform relative deviation {err:.2e}"


@pytest.mark.slow
def test_sebridge_enhance_waveform_parity(ref_env):
    """Noise-free 1-NFE consistency inference (model.py:771-776): the sample
    is f_theta(Y, 0.999, Y) — fully deterministic, so the two stacks must
    agree with NO noise injection at all (normalization, STFT chain, c_skip/
    c_out at t=0.999, spec_back + iSTFT)."""
    ours, variables, ref = _build_pair(ref_env, "sebridge", "false")
    x, y = _wav_pair(seed=4)

    our_wav = ours.enhance(variables, x[None], y[None], key=jax.random.PRNGKey(17))

    with torch.no_grad():
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None]
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 1e-4, f"waveform relative deviation {err:.2e}"


@pytest.mark.slow
def test_sebridge_v2_snr_oracle_enhance_waveform_parity(ref_env, monkeypatch):
    """SNR-conditioned sebridge_v2 1-NFE inference with an oracle SNR
    (model.py:797-810): the Karras snap + Eq. 12 norm-factor correction
    (model.py:726-740) composed with the noise_mag(X, Y, 'max')-scaled draw
    Z = randn * z_mag * 0.999 and X_T = Y + Z. Exercises the one branch where
    the clean spec X enters inference (through the noise magnitude)."""
    ours, variables, ref = _build_pair(
        ref_env, "sebridge_v2", "true", fixed_snr=0.31623, sigma_max=1.0
    )
    x, y = _wav_pair(seed=5)
    key = jax.random.PRNGKey(19)
    noise_rms, clean_rms = 0.4, 1.0

    our_wav = ours.enhance(
        variables, x[None], y[None], key=key,
        oracle=True, clean_rms=clean_rms, noise_rms=noise_rms,
    )

    # our branch draws once: randn_like(key, Y) (score_model.py:586-593)
    dummy = jnp.zeros(_spec_shape(), jnp.complex64)
    _inject_torch_noise(monkeypatch, [np.asarray(randn_like(key, dummy))])
    with torch.no_grad():
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None],
            oracle=True, clean_rms=clean_rms, noise_rms=noise_rms,
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 1e-4, f"waveform relative deviation {err:.2e}"


@pytest.mark.slow
def test_bbed_ode_enhance_waveform_parity(ref_env, monkeypatch):
    """Probability-flow ODE enhancement: our on-device adaptive RK45
    (sampling/ode.py, a port of scipy's RK45 controller) against the
    reference's scipy.integrate.solve_ivp black-box path
    (sampling/__init__.py:95-171), identical prior + denoise draws.

    The two integrators run their own adaptive step controllers on top of
    backbone evaluations that differ at float32 rounding, so the accepted
    step sequences can differ — the tolerance is therefore looser than the
    bit-parity PC tests (both solutions are rtol=1e-5 approximations of the
    same flow)."""
    ours, variables, ref = _build_pair(ref_env, "bbed", "false")
    x, y = _wav_pair(seed=6)
    key = jax.random.PRNGKey(23)

    our_wav, nfe, _ = ours.enhance(
        variables, x[None], y[None], key=key, sampler_type="ode", timeit=True
    )
    assert nfe >= 8  # adaptive solver really ran (not a fixed-step fallback)

    # our draw order (sampling/__init__.py:204-215): prior from split(key)[0],
    # then the denoise predictor's (discarded) noise from split(key)[1]; the
    # reference consumes torch.randn_like in the same order
    # (sdes.py:298-302, then predictors.py:70-80 inside denoise_update_fn).
    prior_key, denoise_key = jax.random.split(key)
    dummy = jnp.zeros(_spec_shape(), jnp.complex64)
    _inject_torch_noise(monkeypatch, [
        np.asarray(randn_like(prior_key, dummy)),
        np.asarray(randn_like(denoise_key, dummy)),
    ])
    with torch.no_grad():
        # device="cpu" threads through enhance **kwargs -> get_ode_sampler
        # (model.py:574-582 -> sampling/__init__.py:95-99), overriding the
        # sampler's hard-coded device='cuda' default (its .to(device) calls
        # are Tensor.to, which the fixture's Module.to patch doesn't cover).
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None],
            sampler_type="ode", device="cpu",
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 5e-3, f"waveform relative deviation {err:.2e}"


@pytest.mark.slow
def test_ouve_pc_enhance_waveform_parity(ref_env, monkeypatch):
    """10-step PC sampling under the OUVE SDE (sdes.py:149-235): extends the
    executed-reference parity evidence beyond BBED to the OU/VE family —
    exponential-interpolation mean, the sigma_min(sigma_max/sigma_min)^t
    diffusion, its closed-form std, and the reverse discretization, all
    through the same predictor/corrector loop."""
    N = 10
    ours, variables, ref = _build_pair(
        ref_env, "bbed", "false",
        sde="ouve", sde_kwargs=dict(theta=1.5, sigma_min=0.05, sigma_max=0.5),
        sigma_max=0.5,
    )
    x, y = _wav_pair(seed=8)
    key = jax.random.PRNGKey(29)

    our_wav = ours.enhance(variables, x[None], y[None], key=key, N=N)

    draws = _replay_pc_draws(key, n_steps=N)
    _inject_torch_noise(monkeypatch, draws)
    with torch.no_grad():
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None], N=N
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 1e-4, f"waveform relative deviation {err:.2e}"


@pytest.mark.slow
def test_proposed_1_pc_enhance_waveform_parity(ref_env, monkeypatch):
    """6-step PC sampling under PROPOSED_1 (sdes.py:314-392), the
    sigma_min/sigma_max reparameterization of BBED with T_sampling=0.99 —
    covers its linear-bridge mean, the sigma_max*t diffusion quirk we
    deliberately reproduce (our sde/__init__.py PROPOSED_1 docstring), and
    the expi-based variance, against the executing reference."""
    N = 6
    ours, variables, ref = _build_pair(
        ref_env, "bbed", "false",
        sde="proposed_1",
        sde_kwargs=dict(T_sampling=0.99, sigma_min=1.0, sigma_max=2.6,
                        theta=0.53),
        sigma_max=1.0,
    )
    x, y = _wav_pair(seed=9)
    key = jax.random.PRNGKey(31)

    our_wav = ours.enhance(variables, x[None], y[None], key=key, N=N)

    draws = _replay_pc_draws(key, n_steps=N)
    _inject_torch_noise(monkeypatch, draws)
    with torch.no_grad():
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None], N=N
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 1e-4, f"waveform relative deviation {err:.2e}"


@pytest.mark.slow
def test_sebridge_v2_enhance_waveform_parity(ref_env, monkeypatch):
    """1-NFE unconditioned consistency inference (model.py:780-791): one
    shared draw Z = randn*sigma_max*0.999, X_T = Y + Z."""
    ours, variables, ref = _build_pair(ref_env, "sebridge_v2", "false")
    x, y = _wav_pair(seed=3)
    key = jax.random.PRNGKey(13)

    our_wav = ours.enhance(variables, x[None], y[None], key=key)

    dummy = jnp.zeros(_spec_shape(), jnp.complex64)
    _inject_torch_noise(monkeypatch, [np.asarray(randn_like(key, dummy))])
    with torch.no_grad():
        ref_wav = ref.enhance(
            torch.from_numpy(x)[None], torch.from_numpy(y)[None]
        )

    assert our_wav.shape == ref_wav.shape == (T_ORIG,)
    err = _rel_err(ref_wav, our_wav)
    assert err < 1e-4, f"waveform relative deviation {err:.2e}"


# ------------------------------------------------ training-loss branch parity

# Every (snr_conditioned x model_type) dispatch of the reference's training
# _step (sgmse/model.py:159-394) plus the sqrt_mse loss variants — the last
# pipeline stage that previously had only white-box (formula) verification.
LOSS_BRANCHES = [
    ("false", "bbed", "mse"),          # DSM vs BBED.marginal_prob, model.py:171-190
    ("false", "bbed", "sqrt_mse"),     # sqrt-compressed posterior-mean loss, model.py:182-188
    ("false", "sebridge", "mse"),      # sqrt(t(1-t)) bridge consistency, model.py:192-221
    ("false", "sebridge", "sqrt_mse"),
    ("false", "sebridge_v2", "mse"),   # linear bridge + t*z, mu conditioning, model.py:223-255
    ("fixed", "sebridge_v2", "mse"),   # |X-Y|-max rescale to fixed_snr, model.py:257-291
    ("fixed", "sebridge_v3", "mse"),   # nonlinear bridge, y0*fixed_snr, model.py:293-326
    ("true", "sebridge_v2", "mse"),    # model.py:329-359
    ("true", "sebridge_v3", "mse"),    # SNR-aligned nonlinear bridge (Eq. 6), model.py:361-390
]


@pytest.mark.slow
@pytest.mark.parametrize("snr_conditioned,model_type,loss_type", LOSS_BRANCHES)
def test_training_loss_branch_parity(ref_env, monkeypatch, snr_conditioned,
                                     model_type, loss_type):
    """Executed-reference parity for a training-loss branch: identical
    weights (converter) + identical draws (torch.rand/randint/randn_like
    monkeypatched to replay OUR kt/kz split schedule) => the reference's
    _step and our loss_fn return the same loss value."""
    fixed_snr = 0.17783 if snr_conditioned in ("fixed", "true") else 1.0
    ours, variables, ref = _build_pair(
        ref_env, model_type, snr_conditioned, fixed_snr=fixed_snr,
        sigma_max=1.0, loss_type=loss_type,
    )

    b = 2
    rng = np.random.default_rng(42)

    def cspec(scale):
        return (
            (rng.standard_normal((b, 1, 256, 64)) +
             1j * rng.standard_normal((b, 1, 256, 64))) * scale
        ).astype(np.complex64)

    x = cspec(0.1)
    y = (x + cspec(0.05)).astype(np.complex64)

    key = jax.random.PRNGKey(37)
    our_loss, _ = ours.loss_fn(
        variables, (jnp.asarray(x), jnp.asarray(y)), key, train=False
    )
    our_loss = float(our_loss)

    # replay OUR draw schedule (score_model.py loss_fn: kt, kz = split(key);
    # t/n from kt, z from kz) into the reference's torch RNG call sites
    kt, kz = jax.random.split(key)
    z = np.asarray(randn_like(kz, jnp.zeros((b, 1, 256, 64), jnp.complex64)))
    if model_type == "bbed":
        u = np.asarray(jax.random.uniform(kt, (b,))).astype(np.float32)
        monkeypatch.setattr(
            torch, "rand", lambda *a, **k: torch.from_numpy(u))
    else:
        n = np.asarray(jax.random.randint(kt, (b,), 1, 30)).astype(np.int64)
        monkeypatch.setattr(
            torch, "randint", lambda *a, **k: torch.from_numpy(n))
    _inject_torch_noise(monkeypatch, [z])

    with torch.no_grad():
        ref_loss = float(
            ref._step((torch.from_numpy(x), torch.from_numpy(y)), 0)
        )

    rel = abs(our_loss - ref_loss) / max(abs(ref_loss), 1e-12)
    print(f"loss parity {snr_conditioned}/{model_type}/{loss_type}: "
          f"ours={our_loss:.8g} ref={ref_loss:.8g} rel={rel:.2e}")
    assert np.isfinite(our_loss) and np.isfinite(ref_loss)
    assert rel < 1e-4, f"loss relative deviation {rel:.2e}"
