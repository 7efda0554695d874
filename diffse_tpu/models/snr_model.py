"""SNRModel: training/eval logic for the SNR-estimator CNN.

Functional twin of sgmse/snr_estimator.py:20-174. Training draws a random
noise-level target gt ~ U[0, 0.999), rescales the noisy mixture to the implied
SNR, applies the normalization-factor correction, and regresses the SNRNet
sigmoid output onto gt with MSE; validation converts both to dB and reports
the mean absolute SNR error.

The data contract uses transform_type='none' (raw complex STFT,
README.md:23), so the specs fed here are uncompressed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..transforms import StftConfig, stft, pad_spec_16
from .score_model import calculate_normfac_direct
from .snrnet import SNRNet


@dataclasses.dataclass
class SNRModelConfig:
    lr: float = 1e-4
    ema_decay: float = 0.999
    num_eval_files: int = 10
    loss_type: str = "mse"
    n_fft: int = 510
    hop_length: int = 128
    num_frames: int = 256
    window: str = "hann"
    transform_type: str = "none"


class SNRModel:
    """SNR estimator wrapper (sgmse/snr_estimator.py:20)."""

    def __init__(self, config: SNRModelConfig = SNRModelConfig()):
        self.cfg = config
        self.dnn = SNRNet()
        self.stft_cfg = StftConfig(
            n_fft=config.n_fft, hop_length=config.hop_length, window=config.window
        )
        self._window = self.stft_cfg.window_array()

    @property
    def hparams(self) -> dict:
        return {"config": dataclasses.asdict(self.cfg)}

    @classmethod
    def from_hparams(cls, hparams: dict, **config_overrides) -> "SNRModel":
        cfg = SNRModelConfig(**{**hparams["config"], **config_overrides})
        return cls(cfg)

    def init_variables(self, key: jax.Array, num_frames: Optional[int] = None):
        t = num_frames or self.cfg.num_frames
        f = self.stft_cfg.num_freq_bins
        x = jnp.zeros((1, 2, f, t), dtype=jnp.float32)
        return self.dnn.init(key, x)

    def prepare_batch(self, wav_batch):
        """On-device preprocessing: normalize by max|y| and raw STFT
        (transform_type='none' data contract, README.md:23)."""
        x_wav, y_wav, *rest = wav_batch
        normfac = jnp.max(jnp.abs(y_wav), axis=-1, keepdims=True)
        x = x_wav / normfac
        y = y_wav / normfac
        X = stft(x, self._window, self.stft_cfg.n_fft, self.stft_cfg.hop_length)[:, None]
        Y = stft(y, self._window, self.stft_cfg.n_fft, self.stft_cfg.hop_length)[:, None]
        return (X, Y, *rest)

    def forward(self, variables, y_spec2ch: jnp.ndarray) -> jnp.ndarray:
        """y_spec2ch: [B, 2, F, T] real/imag channels -> [B, 1] sigmoid g_hat."""
        return self.dnn.apply(variables, y_spec2ch)

    @staticmethod
    def _complex_to_2ch(y: jnp.ndarray) -> jnp.ndarray:
        """[B, 1, F, T] complex -> [B, 2, F, T] real (snr_estimator.py:105-107)."""
        return jnp.concatenate([y.real, y.imag], axis=1)

    def loss_fn(self, variables, batch, key, train=True):
        """Training loss (snr_estimator.py:89-116).

        Args:
            batch: (X, Y) complex specs [B, 1, F, T] with transform 'none'.
        Returns:
            (loss, mutable-updates) — the same contract as ScoreModel.loss_fn,
            so the generic train step applies unchanged.
        """
        x, y = batch[0], batch[1]
        b = x.shape[0]
        gt = jax.random.uniform(key, (b,)) * 0.999
        snr = gt / (1 - gt)
        snr_b = snr[:, None, None, None].astype(x.dtype)
        y = x + (y - x) * 0.56234 * snr_b
        normfac = calculate_normfac_direct(1.0, snr_b, 1.0)
        y = y * normfac

        est_gt = self.forward(variables, self._complex_to_2ch(y))[:, 0]
        loss = jnp.mean((gt - est_gt) ** 2)
        return loss, {}

    def valid_metrics(self, variables, batch):
        """Validation: dB-domain absolute SNR error (snr_estimator.py:100-136).

        Args:
            batch: (X, Y, s, n) with active-RMS clean/noise levels.
        """
        x, y, s, n = batch
        gt = n / (s + n)
        real_snr_db = 20 * jnp.log10((1 - gt) / gt)
        est_gt = self.forward(variables, self._complex_to_2ch(y))[:, 0]
        est_snr_db = 20 * jnp.log10((1 - est_gt) / est_gt)
        loss = jnp.mean((gt - est_gt) ** 2)
        snr_error = jnp.mean(jnp.abs(real_snr_db - est_snr_db))
        return {"valid_loss": loss, "snr_error": snr_error}

    def estimate_from_wav(self, variables, y_wav: jnp.ndarray) -> jnp.ndarray:
        """Waveform -> estimated amplitude-ratio SNR (eval_snr_est.py:102-113)."""
        y_n = y_wav / jnp.max(jnp.abs(y_wav))
        spec = stft(y_n, self._window, self.stft_cfg.n_fft, self.stft_cfg.hop_length)
        spec2 = jnp.stack([spec.real, spec.imag], axis=1)
        spec2 = pad_spec_16(spec2)
        est_gt = self.forward(variables, spec2)[:, 0]
        return est_gt / (1 - est_gt)
