"""SNRNet: the SNR-estimator CNN as a flax.linen module.

Re-design of sgmse/backbones/snrnet.py:8-97. Input is a noisy complex
spectrogram as two real channels ``[B, 2, F=256, T]`` (T a multiple of 16,
see pad_spec_16); the time axis is split into 16-frame clusters which are
embedded by a small conv stack with four parallel time-kernel widths
(1/2/4/8), sequence-modelled with a bidirectional LSTM over clusters, then
statistics-pooled (mean/std/min/max) and projected to a single sigmoid output

    g_hat in (0, 1),  g = 10^(-SNR/20) / (1 + 10^(-SNR/20))

(paper Eq. 10), from which the SNR estimate is g_hat / (1 - g_hat)
(amplitude ratio) or 20 log10((1-g)/g) dB.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .shared import BackboneRegistry


@BackboneRegistry.register("snrnet")
class SNRNet(nn.Module):
    """~600k-param SNR estimator (conv channels 384->32 vs its origin, one FC;
    paper §4.3)."""

    convt_out: int = 32
    lstm_hidden: int = 128

    @staticmethod
    def add_argparse_args(parser):
        return parser

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Args:
            x: ``[B, 2, F=256, T]`` real/imag channels of the noisy STFT.

        Returns:
            ``[B, 1]`` sigmoid outputs g_hat.
        """
        b, c, f, t = x.shape
        assert c == 2 and f == 256, f"SNRNet expects [B,2,256,T], got {x.shape}"
        assert t % 16 == 0, "time axis must be padded to a multiple of 16 (pad_spec_16)"
        time_clusters = t // 16

        # [B,2,F,T] -> [B,T,2,F] -> [B*(T/16),16,2,F] -> NHWC [B*(T/16),F,16,2]
        # (snrnet.py:50-54, with the channel axis moved last for TPU layouts)
        h = jnp.transpose(x, (0, 3, 1, 2))
        h = h.reshape(b * time_clusters, 16, 2, f)
        h = jnp.transpose(h, (0, 3, 1, 2))  # [N, F=256, 16, 2]

        h = nn.Conv(32, (5, 5), padding="SAME", name="conv5x5_1")(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))  # [N,128,8,32]
        h = nn.Conv(32, (3, 3), padding="SAME", name="conv3x3_1")(h)
        h = nn.max_pool(h, (2, 1), strides=(2, 1))  # [N,64,8,32]

        # Four parallel convs over the full 64-bin frequency axis with time
        # kernel widths 1/2/4/8, each max-pooled over remaining time
        # (snrnet.py:26-34, 65-75).
        feats = []
        for width, pool in ((1, 8), (2, 7), (4, 5), (8, 1)):
            fi = nn.Conv(
                self.convt_out, (64, width), padding="VALID", name=f"convt_{width}"
            )(h)  # [N, 1, 8-width+1, convt_out]
            fi = nn.max_pool(fi, (1, pool), strides=(1, pool))  # [N,1,1,convt_out]
            feats.append(fi[:, 0, 0, :])
        h = jnp.concatenate(feats, axis=-1)  # [N, 4*convt_out]

        # Bidirectional LSTM over the cluster sequence (snrnet.py:36,79).
        h = h.reshape(b, time_clusters, self.convt_out * 4)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden), name="lstm_fwd")(h)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden), name="lstm_bwd")(
            jnp.flip(h, axis=1)
        )
        h = jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)  # [B, T/16, 256]

        # Statistics pooling: mean / std (unbiased, torch convention) / min / max
        # (snrnet.py:81-86) -> [B, 1024].
        mean = jnp.mean(h, axis=1)
        std = jnp.std(h, axis=1, ddof=1)
        mn = jnp.min(h, axis=1)
        mx = jnp.max(h, axis=1)
        h = jnp.concatenate([mean, std, mn, mx], axis=-1)

        h = nn.Dense(1, name="fc")(h)
        return nn.sigmoid(h)
