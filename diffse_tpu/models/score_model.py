"""ScoreModel: training losses, score parameterizations, and enhancement.

Functional re-design of the reference's LightningModule (sgmse/model.py:32-839)
as a plain Python orchestrator around pure jitted functions:

  - ``forward``:  consistency-model c_skip/c_out parameterizations and the
    score sign flip, per (snr_conditioned x model_type) (model.py:481-543).
  - ``loss_fn``:  all training branches (model.py:159-394) — bbed denoising
    score matching, sebridge/sebridge_v2 consistency on linear bridges, and
    the SNR-aligned nonlinear sebridge_v3 bridge that applies the spectrogram
    compression inside the step (the whole loss, including STFT-domain
    transforms, is one XLA program).
  - ``enhance``:  one-call speech enhancement (model.py:702-839): SNR
    estimation / oracle, Karras-grid snapping, normalization-factor
    correction, pad-to-64, then either the 30-step PC sampler (one lax.scan)
    or single-NFE consistency inference, and iSTFT back to audio. Jitted per
    (branch, padded-width) bucket.

Unlike the reference, the SNR estimator is injected explicitly (the reference
loads a checkpoint onto CUDA at import time, model.py:25-30 — a documented
quirk we do not replicate).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sde import SDERegistry
from ..sampling import get_ode_sampler, get_pc_sampler
from ..transforms import (
    SpecTransformConfig,
    StftConfig,
    istft,
    pad_spec,
    pad_spec_16,
    spec_back,
    spec_fwd,
    stft,
    width_bucket,
)
from ..utils import randn_like
from .shared import BackboneRegistry

# Karras rho=7 timestep grid with N=30, eps=0.001, T=1 (model.py:22-23).
_i_30 = np.arange(1, 30 + 1)
t_30 = (
    0.001 ** (1 / 7) + (_i_30 - 1) / (30 - 1) * (1 ** (1 / 7) - 0.001 ** (1 / 7))
) ** 7


def karras_t(n, N=30, rho=7.0, eps=0.001, T=1.0):
    """t_n of the Karras grid for (possibly traced) integer n in [1, N]."""
    return (eps ** (1 / rho) + (n - 1) / (N - 1) * (T ** (1 / rho) - eps ** (1 / rho))) ** rho


def calculate_snr_direct(s, n, fixed_snr):
    """(n/s) / (10^0.25 * fixed_snr) — maps an SNR estimate to a diffusion
    time for the -5 dB training dataset (model.py:627-629, inference.py:76-78)."""
    snr = n / s
    return snr / (10**0.25 * fixed_snr)


def calculate_normfac_direct(s, n, fixed_snr):
    """Normalization-factor correction, paper Eq. 12 constants
    (model.py:631-634, inference.py:80-83)."""
    return (2.040166) * (0.240253 + 0.759747 * fixed_snr**2) ** 0.5 / ((1 + (n / s) ** 2) ** 0.5)


def noise_mag(s, s_hat, mode: str = "mean"):
    """Noise magnitude between two specs (model.py:148-156)."""
    if mode == "mean":
        return jnp.abs(jnp.mean(jnp.sqrt(jnp.square(jnp.abs(s - s_hat)))))
    elif mode == "max":
        return jnp.max(jnp.abs(s - s_hat))
    return jnp.asarray(0.0)


@dataclasses.dataclass
class ScoreModelConfig:
    """Hyperparameters, names/defaults matching the reference argparse surface
    (model.py:33-41, train.py:29-34)."""

    backbone: str = "ncsnpp"
    sde: str = "ouve"
    model_type: str = "sebridge"  # bbed | sebridge | sebridge_v2 | sebridge_v3
    snr_conditioned: str = "false"  # false | fixed | true
    fixed_snr: float = 1.0
    lr: float = 1e-4
    ema_decay: float = 0.999
    t_eps: float = 3e-2
    loss_type: str = "mse"  # mse | mae | sqrt_mse
    loss_abs_exponent: float = 0.5
    num_eval_files: int = 10
    sigma_max: float = 0.5
    # data-contract parameters (SpecsDataModule, data_module.py:180-194)
    n_fft: int = 510
    hop_length: int = 128
    num_frames: int = 256
    window: str = "hann"
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    transform_type: str = "exponent"
    normalize: str = "noisy"


class ScoreModel:
    """Score / consistency model for speech enhancement (sgmse/model.py:32)."""

    def __init__(
        self,
        config: ScoreModelConfig,
        backbone_kwargs: Optional[dict] = None,
        sde_kwargs: Optional[dict] = None,
        snr_model: Optional[Tuple[Any, Any]] = None,  # (SNRNet module, variables)
    ):
        self.cfg = config
        backbone_cls = BackboneRegistry.get_by_name(config.backbone)
        self.backbone = backbone_cls(**(backbone_kwargs or {}))
        self.backbone_takes_noise_cond = config.backbone == "ncsnpp_snr"

        sde_name, sde_kwargs = config.sde, dict(sde_kwargs or {})
        if sde_name == "bbve":
            # Legacy alias remap for old checkpoints (model.py:70-77).
            sde_name = "bbed"
            sde_kwargs["k"] = sde_kwargs.pop("sigma_max")
            sde_kwargs.pop("sigma_min", None)
        sde_cls = SDERegistry.get_by_name(sde_name)
        self.sde = sde_cls(**sde_kwargs)

        self.stft_cfg = StftConfig(
            n_fft=config.n_fft, hop_length=config.hop_length, window=config.window
        )
        self.spec_cfg = SpecTransformConfig(
            transform_type=config.transform_type,
            spec_factor=config.spec_factor,
            spec_abs_exponent=config.spec_abs_exponent,
        )
        self._window = self.stft_cfg.window_array()
        self.snr_model = snr_model
        self._enhance_cache: dict = {}
        self._backbone_kwargs = dict(backbone_kwargs or {})
        self._sde_kwargs = dict(sde_kwargs or {})

    # ----------------------------------------------------------- persistence
    @property
    def hparams(self) -> dict:
        """Serializable hyperparameters, enabling load-with-overrides
        (the analog of Lightning save_hyperparameters, model.py:93)."""
        return {
            "config": dataclasses.asdict(self.cfg),
            "backbone_kwargs": self._backbone_kwargs,
            "sde_kwargs": self._sde_kwargs,
        }

    @classmethod
    def from_hparams(cls, hparams: dict, snr_model=None, **config_overrides) -> "ScoreModel":
        cfg = ScoreModelConfig(**{**hparams["config"], **config_overrides})
        return cls(
            cfg,
            backbone_kwargs=hparams.get("backbone_kwargs") or {},
            sde_kwargs=hparams.get("sde_kwargs") or {},
            snr_model=snr_model,
        )

    # ------------------------------------------------------------------ setup
    def init_variables(self, key: jax.Array, num_frames: Optional[int] = None,
                       num_freq_bins: Optional[int] = None):
        """Initialize backbone variables at the training crop shape."""
        t_frames = num_frames or self.cfg.num_frames
        f = num_freq_bins or self.stft_cfg.num_freq_bins
        x = jnp.zeros((1, 2, f, t_frames), dtype=jnp.complex64)
        t = jnp.ones((1,), dtype=jnp.float32)
        if self.backbone_takes_noise_cond:
            return self.backbone.init(key, x, t, t)
        return self.backbone.init(key, x, t)

    # ------------------------------------------------------------ transforms
    def _forward_transform(self, spec):
        return spec_fwd(spec, self.spec_cfg)

    def _backward_transform(self, spec):
        return spec_back(spec, self.spec_cfg)

    def _stft(self, sig):
        return stft(sig, self._window, self.stft_cfg.n_fft, self.stft_cfg.hop_length)

    def _istft(self, spec, length=None):
        return istft(
            spec, self._window, self.stft_cfg.n_fft, self.stft_cfg.hop_length,
            length=length,
        )

    def to_audio(self, spec, length=None):
        return self._istft(self._backward_transform(spec), length)

    def prepare_batch(self, wav_batch):
        """On-device batch preprocessing: normalize -> STFT -> spec_fwd.

        The reference runs this chain per-item in CPU DataLoader workers
        (data_module.py:70-84); here it fuses into the jitted train step so
        the host only ships raw waveform crops.

        Args:
            wav_batch: (x_wav [B, L], y_wav [B, L], *rest) — rest (e.g. the
                active-RMS s/n of Specs_SNR) is passed through.
        Returns:
            (X [B, 1, F, T], Y [B, 1, F, T], *rest) complex spec batch.
        """
        x_wav, y_wav, *rest = wav_batch
        if self.cfg.normalize == "noisy":
            normfac = jnp.max(jnp.abs(y_wav), axis=-1, keepdims=True)
        elif self.cfg.normalize == "clean":
            normfac = jnp.max(jnp.abs(x_wav), axis=-1, keepdims=True)
        else:
            normfac = jnp.ones((x_wav.shape[0], 1), dtype=x_wav.dtype)
        x = x_wav / normfac
        y = y_wav / normfac
        X = self._forward_transform(self._stft(x))[:, None]
        Y = self._forward_transform(self._stft(y))[:, None]
        return (X, Y, *rest)

    # --------------------------------------------------------------- forward
    def _apply_backbone(self, variables, dnn_input, t, s=None, train=False):
        mutable = ["batch_stats"] if (train and "batch_stats" in variables) else False
        if self.backbone_takes_noise_cond:
            args = (dnn_input, t, s if s is not None else t)
        else:
            args = (dnn_input, t)
        if mutable:
            out, updates = self.backbone.apply(variables, *args, train=train, mutable=mutable)
            return out, updates
        out = self.backbone.apply(variables, *args, train=train)
        return out, {}

    def forward(self, variables, x, t, y, s=None, train=False):
        """Score/consistency parameterization (model.py:481-543).

        Args:
            x: complex [B, 1, F, T] diffusion state.
            t: [B] times.
            y: complex [B, 1, F, T] conditioner.
        Returns:
            (score [B, 1, F, T], mutable-updates dict)
        """
        cfg = self.cfg
        dnn_input = jnp.concatenate([x, y], axis=1)
        tb = t[:, None, None, None]

        def consistency(eps=0.001, sigma_data=0.5):
            c_skip = sigma_data**2 / ((tb - eps) ** 2 + sigma_data**2)
            c_out = (sigma_data * (tb - eps)) / ((sigma_data**2 + tb**2) ** 0.5)
            raw, updates = self._apply_backbone(variables, dnn_input, t, s=s, train=train)
            return c_skip * x + c_out * raw, updates

        def consistency_simple(eps=0.001):
            c_skip = 1 / ((tb - eps) + 1)
            c_out = (tb - eps) / ((tb - eps) + 1)
            raw, updates = self._apply_backbone(variables, dnn_input, t, s=s, train=train)
            return c_skip * x + c_out * raw, updates

        if cfg.snr_conditioned == "false":
            if cfg.model_type == "bbed":
                raw, updates = self._apply_backbone(variables, dnn_input, t, s=s, train=train)
                return -raw, updates
            elif cfg.model_type in ("sebridge", "sebridge_v2"):
                return consistency()
        elif cfg.snr_conditioned == "fixed":
            if cfg.model_type == "sebridge_v2":
                return consistency_simple()
            if cfg.model_type == "sebridge_v3":
                return consistency()
        elif cfg.snr_conditioned == "true":
            if cfg.model_type in ("sebridge_v2", "sebridge_v3"):
                return consistency()
        raise ValueError(
            f"Unsupported (snr_conditioned={cfg.snr_conditioned}, "
            f"model_type={cfg.model_type})"
        )

    # ------------------------------------------------------------------ loss
    def _reduce_loss(self, err):
        """0.5 * sum over non-batch dims of |err|^2, mean over batch
        (model.py:137-146)."""
        losses = jnp.square(jnp.abs(err))
        return jnp.mean(0.5 * jnp.sum(losses.reshape(losses.shape[0], -1), axis=-1))

    def _consistency_loss(self, f_theta, f_theta_minus):
        if self.cfg.loss_type == "mse":
            return self._reduce_loss(f_theta - f_theta_minus)
        elif self.cfg.loss_type == "sqrt_mse":
            sq = jnp.sqrt(jnp.abs(f_theta)) * jnp.exp(1j * jnp.angle(f_theta))
            sq_m = jnp.sqrt(jnp.abs(f_theta_minus)) * jnp.exp(1j * jnp.angle(f_theta_minus))
            return self._reduce_loss(sq - sq_m)
        raise ValueError(f"loss_type {self.cfg.loss_type} not supported here")

    def _karras_pair(self, key, batch, T):
        """Sample adjacent Karras timesteps t_n, t_{n+1} (model.py:194-201)."""
        N, rho, eps = 30, 7.0, 0.001
        n = jax.random.randint(key, (batch,), 1, N).astype(jnp.float32)
        tn = karras_t(n, N=N, rho=rho, eps=eps, T=T)
        tn1 = karras_t(n + 1, N=N, rho=rho, eps=eps, T=T)
        return tn[:, None, None, None], tn1[:, None, None, None]

    def loss_fn(self, variables, batch, key, train=True):
        """Training/validation loss, dispatching on
        (snr_conditioned x model_type) exactly as model.py:159-394.

        Args:
            batch: (X, Y) complex specs [B, 1, F, T] (valid batches may carry
                extra s/n entries which are ignored by the loss).
        Returns:
            (loss, mutable-updates)
        """
        cfg = self.cfg
        x, y = batch[0], batch[1]
        kt, kz = jax.random.split(key)
        b = x.shape[0]

        if cfg.snr_conditioned == "false":
            if cfg.model_type == "bbed":
                rdm = jax.random.uniform(kt, (b,)) * (self.sde.T - cfg.t_eps) + cfg.t_eps
                t = jnp.minimum(rdm, self.sde.T)
                mean, std = self.sde.marginal_prob(x, t, y)
                z = randn_like(kz, x)
                sigmas = std[:, None, None, None].astype(x.dtype)
                perturbed = mean + sigmas * z
                score, updates = self.forward(variables, perturbed, t, y, train=train)
                if cfg.loss_type in ("mse", "mae"):
                    err = sigmas * score + z
                    if cfg.loss_type == "mse":
                        loss = self._reduce_loss(err)
                    else:
                        # NOTE: the reference's mae branch reads `err` before
                        # assignment (model.py:141-142) and would crash; here
                        # it is implemented as the natural absolute-error loss.
                        losses = jnp.abs(err)
                        loss = jnp.mean(
                            0.5 * jnp.sum(losses.reshape(b, -1), axis=-1)
                        )
                elif cfg.loss_type == "sqrt_mse":
                    mean_hat = perturbed + (sigmas**2) * score
                    sqrt_mean_hat = jnp.sqrt(jnp.abs(mean_hat)) * jnp.exp(1j * jnp.angle(mean_hat))
                    sqrt_mean = jnp.sqrt(jnp.abs(mean)) * jnp.exp(1j * jnp.angle(mean))
                    loss = self._reduce_loss((sqrt_mean_hat - sqrt_mean) / sigmas)
                else:
                    raise ValueError(f"unknown loss_type {cfg.loss_type}")
                return loss, updates

            elif cfg.model_type == "sebridge":
                tn, tn1 = self._karras_pair(kt, b, T=0.999)
                z = randn_like(kz, x) * cfg.sigma_max
                x_tn = y * tn + x * (1 - tn) + ((tn * (1 - tn)) ** 0.5) * z
                x_tn1 = y * tn1 + x * (1 - tn1) + ((tn1 * (1 - tn1)) ** 0.5) * z
                f, updates = self.forward(variables, x_tn1, tn1[:, 0, 0, 0], y, train=train)
                f_m, updates2 = self.forward(variables, x_tn, tn[:, 0, 0, 0], y, train=train)
                return self._consistency_loss(f, f_m), {**updates, **updates2}

            elif cfg.model_type == "sebridge_v2":
                tn, tn1 = self._karras_pair(kt, b, T=1.0)
                z = randn_like(kz, x) * cfg.sigma_max
                mu_tn = y * tn + x * (1 - tn)
                mu_tn1 = y * tn1 + x * (1 - tn1)
                x_tn = mu_tn + tn * z
                x_tn1 = mu_tn1 + tn1 * z
                f, updates = self.forward(variables, x_tn1, tn1[:, 0, 0, 0], mu_tn1, train=train)
                f_m, updates2 = self.forward(variables, x_tn, tn[:, 0, 0, 0], mu_tn, train=train)
                return self._consistency_loss(f, f_m), {**updates, **updates2}

        elif cfg.snr_conditioned == "fixed":
            if cfg.model_type == "sebridge_v2":
                tn, tn1 = self._karras_pair(kt, b, T=0.999)
                noise_size = noise_mag(x, y, mode="max")
                y = x + (y - x) / noise_size * cfg.fixed_snr
                z = randn_like(kz, x) * cfg.sigma_max
                x_tn = y * tn + x * (1 - tn) + tn * z
                x_tn1 = y * tn1 + x * (1 - tn1) + tn1 * z
                f, updates = self.forward(variables, x_tn1, tn1[:, 0, 0, 0], y, train=train)
                f_m, updates2 = self.forward(variables, x_tn, tn[:, 0, 0, 0], y, train=train)
                return self._consistency_loss(f, f_m), {**updates, **updates2}

            if cfg.model_type == "sebridge_v3":
                tn, tn1 = self._karras_pair(kt, b, T=1.0)
                z = randn_like(kz, x) * cfg.sigma_max
                # SNR-aligned nonlinear bridge on un-transformed specs with the
                # noise rescaled to fixed_snr (model.py:293-326, paper Eq. 6).
                x_ori = self._backward_transform(x)
                y0_ori = self._backward_transform(y) - x_ori
                y0_snr = y0_ori * cfg.fixed_snr
                mu_tn = self._forward_transform(x_ori + y0_snr * tn)
                mu_tn1 = self._forward_transform(x_ori + y0_snr * tn1)
                x_tn = mu_tn + tn * z
                x_tn1 = mu_tn1 + tn1 * z
                f, updates = self.forward(variables, x_tn1, tn1[:, 0, 0, 0], mu_tn1, train=train)
                f_m, updates2 = self.forward(variables, x_tn, tn[:, 0, 0, 0], mu_tn, train=train)
                return self._consistency_loss(f, f_m), {**updates, **updates2}

        elif cfg.snr_conditioned == "true":
            if cfg.model_type == "sebridge_v2":
                tn, tn1 = self._karras_pair(kt, b, T=1.0)
                z = randn_like(kz, x) * cfg.sigma_max
                mu_tn = y * tn + x * (1 - tn)
                mu_tn1 = y * tn1 + x * (1 - tn1)
                x_tn = mu_tn + tn * z
                x_tn1 = mu_tn1 + tn1 * z
                f, updates = self.forward(variables, x_tn1, tn1[:, 0, 0, 0], mu_tn1, train=train)
                f_m, updates2 = self.forward(variables, x_tn, tn[:, 0, 0, 0], mu_tn, train=train)
                return self._consistency_loss(f, f_m), {**updates, **updates2}

            if cfg.model_type == "sebridge_v3":
                tn, tn1 = self._karras_pair(kt, b, T=1.0)
                z = randn_like(kz, x) * cfg.sigma_max
                # SNR-aligned nonlinear bridge (model.py:361-390, paper Eq. 6):
                # interpolate in the *un-compressed* STFT domain, re-compress.
                x_b = self._backward_transform(x)
                y_b = self._backward_transform(y)
                mu_tn = self._forward_transform(x_b * (1 - tn) + y_b * tn)
                mu_tn1 = self._forward_transform(x_b * (1 - tn1) + y_b * tn1)
                x_tn = mu_tn + tn * z
                x_tn1 = mu_tn1 + tn1 * z
                f, updates = self.forward(variables, x_tn1, tn1[:, 0, 0, 0], mu_tn1, train=train)
                f_m, updates2 = self.forward(variables, x_tn, tn[:, 0, 0, 0], mu_tn, train=train)
                return self._consistency_loss(f, f_m), {**updates, **updates2}

        raise ValueError(
            f"Unsupported (snr_conditioned={cfg.snr_conditioned}, "
            f"model_type={cfg.model_type})"
        )

    # -------------------------------------------------------------- sampling
    def get_pc_sampler(self, predictor_name, corrector_name, variables, y,
                       Y_prior=None, N=None, minibatch=None, **kwargs):
        """PC sampler closure over current variables (model.py:550-572).

        With `minibatch`, returns a batched sampling fn that splits `y` into
        minibatches (model.py:560-572) — each chunk still runs the whole
        reverse SDE as one lax.scan.
        """
        sde = self.sde if N is None else self.sde.replace(N=N)
        score_fn = lambda x_, t_, y_: self.forward(variables, x_, t_, y_)[0]
        kwargs = {"eps": self.cfg.t_eps, **kwargs}
        if minibatch is None:
            return get_pc_sampler(
                predictor_name, corrector_name, sde=sde, score_fn=score_fn, Y=y,
                Y_prior=Y_prior, **kwargs,
            )

        m = y.shape[0]

        def batched_sampling_fn(key: jax.Array):
            samples, ns = [], []
            for i in range(int(math.ceil(m / minibatch))):
                y_mini = y[i * minibatch : (i + 1) * minibatch]
                y_prior_mini = (
                    Y_prior[i * minibatch : (i + 1) * minibatch]
                    if Y_prior is not None else None
                )
                sampler = get_pc_sampler(
                    predictor_name, corrector_name, sde=sde, score_fn=score_fn,
                    Y=y_mini, Y_prior=y_prior_mini, **kwargs,
                )
                sample, n = sampler(jax.random.fold_in(key, i))
                samples.append(sample)
                ns.append(n)
            return jnp.concatenate(samples, axis=0), ns

        return batched_sampling_fn

    def get_ode_sampler(self, variables, y, Y_prior=None, N=None, **kwargs):
        sde = self.sde if N is None else self.sde.replace(N=N)
        score_fn = lambda x_, t_, y_: self.forward(variables, x_, t_, y_)[0]
        kwargs = {"eps": self.cfg.t_eps, **kwargs}
        return get_ode_sampler(sde, score_fn, y=y, Y_prior=Y_prior, **kwargs)

    # -------------------------------------------------------------- enhance
    def estimate_snr(self, y_wav: jnp.ndarray) -> jnp.ndarray:
        """SNR estimation from the noisy waveform via SNRNet
        (model.py:713-721): normalize, raw STFT (transform 'none'), 2 real
        channels, pad T to 16, sigmoid output -> est_snr = g/(1-g)."""
        if self.snr_model is None:
            raise ValueError("snr_conditioned='true' requires an snr_model")
        snr_module, snr_vars = self.snr_model
        # Per-ROW normalization: the reference normalizes one utterance at a
        # time (model.py:714); a batch-global max would couple rows when
        # estimating several utterances in one call.
        y_n = y_wav / jnp.max(jnp.abs(y_wav), axis=-1, keepdims=True)
        spec = self._stft(y_n)  # [B, F, T] complex (raw, no compression)
        spec2 = jnp.stack([spec.real, spec.imag], axis=1)  # [B, 2, F, T]
        spec2 = pad_spec_16(spec2)
        est_gt = snr_module.apply(snr_vars, spec2)[:, 0]
        return est_gt / (1 - est_gt)

    def _enhance_jit(self, branch: str, t_pad: int, n_steps: int, predictor: str,
                     corrector: str, corrector_steps: int, oracle: bool,
                     seq_mesh=None, timestep_type: str = "linear"):
        """Build (and cache) the jitted end-to-end enhancement function for a
        given branch and padded width: normalize -> STFT -> sample -> iSTFT,
        all one XLA program.

        The corrector ``snr`` is a *traced* argument of the compiled function
        (it only enters corrector arithmetic), so one compile serves snr
        sweeps — important on backends where a 65M-param compile costs
        minutes. ``corrector_steps`` stays a cache key: it changes program
        structure.

        With ``seq_mesh`` (a 1-D ``Mesh`` over a ``seq`` axis,
        ``parallel.sequence.make_seq_mesh``), the spectrogram's frames axis is
        sharding-constrained over the mesh right after the STFT; GSPMD then
        partitions the whole U-Net/sampler program (conv halos + attention
        all-gathers over ICI) from that one annotation. Semantics-preserving:
        outputs match the single-device program to float tolerance."""
        mesh_key = None
        if seq_mesh is not None:
            mesh_key = (seq_mesh.axis_names, seq_mesh.devices.shape,
                        tuple(d.id for d in seq_mesh.devices.flat))
        cache_key = (branch, t_pad, n_steps, predictor, corrector,
                     corrector_steps, oracle, mesh_key, timestep_type)
        if cache_key in self._enhance_cache:
            return self._enhance_cache[cache_key]

        cfg = self.cfg
        num_frames_pad = t_pad

        def prepare(x_wav, y_wav, norm_factor):
            y = y_wav / norm_factor
            x = x_wav / norm_factor
            Y = self._forward_transform(self._stft(y))[:, None]  # [1,1,F,T]
            X = self._forward_transform(self._stft(x))[:, None]
            Y = pad_spec(Y)
            X = pad_spec(X)
            if seq_mesh is not None:
                from ..parallel.sequence import constrain_frames
                ax = seq_mesh.axis_names[0]  # honor a custom axis name
                X = constrain_frames(X, seq_mesh, ax)
                Y = constrain_frames(Y, seq_mesh, ax)
            return X, Y

        def fn(variables, x_wav, y_wav, key, est_snr, snr):
            nfe = n_steps
            norm_factor = jnp.max(jnp.abs(y_wav))
            t_hat = jnp.asarray(0.0)
            if branch.endswith("_snr"):
                # Snap t_hat to the Karras grid and correct the normalization
                # factor (model.py:726-740, paper Eq. 12).
                t_ = calculate_snr_direct(1.0, est_snr, cfg.fixed_snr)
                idx = jnp.argmin(jnp.abs(jnp.asarray(t_30) - t_))
                t_hat = jnp.asarray(t_30)[idx]
                est_snr_ = 10**0.25 * cfg.fixed_snr * t_hat
                normfac_ = calculate_normfac_direct(1.0, est_snr_, cfg.fixed_snr)
                norm_factor = norm_factor * normfac_

            X, Y = prepare(x_wav, y_wav, norm_factor)

            if branch == "bbed_pc":
                score_fn = lambda x_, t_, y_: self.forward(variables, x_, t_, y_)[0]
                sde = self.sde.replace(N=n_steps)
                sampler = get_pc_sampler(
                    predictor, corrector, sde=sde, score_fn=score_fn, Y=Y,
                    denoise=True, eps=cfg.t_eps, snr=snr,
                    corrector_steps=corrector_steps,
                    timestep_type=timestep_type,
                )
                sample, ns = sampler(key)
                nfe = ns
            elif branch == "bbed_ode":
                score_fn = lambda x_, t_, y_: self.forward(variables, x_, t_, y_)[0]
                sde = self.sde.replace(N=n_steps)
                sampler = get_ode_sampler(sde, score_fn, y=Y, eps=cfg.t_eps)
                sample, nfe = sampler(key)
            elif branch == "sebridge":
                vec_t = jnp.full((Y.shape[0],), 0.999)
                sample, _ = self.forward(variables, Y, vec_t, Y)
                nfe = 1
            elif branch == "sebridge_v2":
                vec_t = jnp.full((Y.shape[0],), 0.999)
                Z = randn_like(key, Y) * cfg.sigma_max * 0.999
                X_T = Y + Z
                sample, _ = self.forward(variables, X_T, vec_t, Y)
                nfe = 1
            elif branch == "sebridge_v2_snr":
                z_mag = noise_mag(X, Y, mode="max") * cfg.sigma_max
                vec_t = jnp.full((Y.shape[0],), 0.999)
                vec_s = jnp.full((Y.shape[0],), 1.0) * z_mag * 0.999
                Z = randn_like(key, Y) * z_mag * 0.999
                X_T = Y + Z
                sample, _ = self.forward(variables, X_T, vec_t, Y, s=vec_s)
                nfe = 1
            elif branch == "sebridge_v3_snr":
                vec_t = jnp.full((Y.shape[0],), 1.0) * t_hat
                Z = randn_like(key, Y) * cfg.sigma_max * t_hat
                X_T = Y + Z
                sample, _ = self.forward(variables, X_T, vec_t, Y)
                nfe = 1
            else:
                raise ValueError(f"unknown enhance branch {branch}")

            x_hat = self.to_audio(sample[:, 0])  # [1, samples_padded]
            x_hat = x_hat * norm_factor
            return x_hat, jnp.asarray(nfe)

        jitted = jax.jit(fn)
        self._enhance_cache[cache_key] = jitted
        return jitted

    def enhance(
        self,
        variables,
        x: jnp.ndarray,
        y: jnp.ndarray,
        key: Optional[jax.Array] = None,
        sampler_type: str = "pc",
        predictor: str = "reverse_diffusion",
        corrector: str = "ald",
        N: int = 30,
        corrector_steps: int = 1,
        snr: float = 0.5,
        timeit: bool = False,
        oracle: bool = False,
        clean_rms: float = 1.0,
        noise_rms: float = 1.0,
        seq_mesh=None,
        timestep_type: str = "linear",
        **ignored_kwargs,
    ):
        """One-call speech enhancement of noisy speech `y` (model.py:702-839).

        Args:
            x, y: clean/noisy waveforms ``[1, T_samples]`` (x is only used by
                branches that reference it; pass y twice if unavailable).
            seq_mesh: optional 1-D ``Mesh`` over a ``seq`` axis
                (``parallel.sequence.make_seq_mesh``): shard the spectrogram
                frames across devices for single-utterance scale-out.
        Returns:
            numpy enhanced waveform [T_samples]; with timeit=True a tuple
            (x_hat, nfe, rtf).
        """
        sr = 16000
        start = time.time()
        cfg = self.cfg
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        t_orig = y.shape[-1]
        if key is None:
            key = jax.random.PRNGKey(0)

        est_snr = jnp.asarray(1.0)
        if cfg.snr_conditioned == "true":
            if not oracle:
                est_snr = self.estimate_snr(y)[0]
            else:
                est_snr = jnp.asarray(noise_rms / clean_rms)

        if cfg.snr_conditioned == "false":
            if cfg.model_type == "bbed":
                branch = "bbed_pc" if sampler_type == "pc" else "bbed_ode"
            elif cfg.model_type == "sebridge":
                branch = "sebridge"
            elif cfg.model_type == "sebridge_v2":
                branch = "sebridge_v2"
            else:
                raise ValueError(f"unsupported model_type {cfg.model_type}")
        elif cfg.snr_conditioned == "fixed":
            raise NotImplementedError(
                "snr fixed is only for experiment purpose, not real inference."
            )
        elif cfg.snr_conditioned == "true":
            branch = f"{cfg.model_type}_snr"
        else:
            raise ValueError(f"unknown snr_conditioned {cfg.snr_conditioned}")

        # Static shape bucket: frames padded to a multiple of 64. The
        # waveforms are zero-padded on the host to the bucket's exact sample
        # count so the jitted program's input shapes are bucket-static — one
        # compile serves every utterance length in the bucket (jax.jit
        # retraces per input shape, so passing raw lengths would recompile
        # the full 65M-param program per distinct length). The max-abs
        # normalizer ignores the zero tail; pad_spec inside becomes a no-op.
        t_pad, pad_samples = width_bucket(t_orig, cfg.hop_length)
        if t_orig < pad_samples:
            pad = [(0, 0)] * (y.ndim - 1) + [(0, pad_samples - t_orig)]
            x = jnp.pad(x, pad)
            y = jnp.pad(y, pad)
        elif t_orig > pad_samples:
            # frames % 64 == 0: the bucket's iSTFT can only produce
            # (t_pad-1)*hop samples anyway (same tail loss as the reference's
            # istft-after-pad_spec and as batch_eval); keep the shape static.
            x = x[..., :pad_samples]
            y = y[..., :pad_samples]

        fn = self._enhance_jit(
            branch, t_pad, N, predictor, corrector, corrector_steps, oracle,
            seq_mesh=seq_mesh, timestep_type=timestep_type,
        )
        x_hat, nfe = fn(
            variables, x, y, key, est_snr, jnp.asarray(snr, dtype=jnp.float32)
        )
        x_hat = np.asarray(x_hat)[0, :t_orig]
        if x_hat.shape[-1] < t_orig:
            # frames % 64 == 0 bucket: the iSTFT yields (t_pad-1)*hop samples,
            # up to hop-1 short of t_orig. Zero-pad back so callers can align
            # against the full-length clean reference (the torch reference's
            # istft(length=T) zero-pads the same tail, sgmse/model.py:612-625).
            x_hat = np.pad(x_hat, (0, t_orig - x_hat.shape[-1]))
        end = time.time()
        if timeit:
            rtf = (end - start) / (len(x_hat) / sr)
            return x_hat, int(nfe), rtf
        return x_hat
