"""Frozen real-signal metric goldens over the reference-shipped wavs.

The native PESQ/ESTOI/SI-SDR implementations rank training checkpoints
(reference train.py:95-103 monitors pesq/si_sdr), so silent numeric drift in
a refactor must fail loudly. These are exact regression values computed from
the 14 wavs shipped under /root/reference/dataset/ (the only real speech in
this environment) plus deep_eval-style SNR remixes (deep_eval.py:112-118) —
frozen 2026-08-19 with tolerances far below a 0.01-MOS / 0.01-dB regression.

The absolute anchors that VALIDATE these implementations live in
tests/test_pesq.py / test_metrics.py (identity = 4.6439, level invariance,
published mixture averages, hand-derived ESTOI goldens); this file only
pins the current values against drift.
"""

import os

import numpy as np
import pytest

from diffse_tpu.data.wavio import read_wav
from diffse_tpu.evaluation.metrics import estoi, pesq_wb, si_sdr

_ROOT = "/root/reference/dataset"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_ROOT), reason="reference dataset not present"
)

# (subset, filename, pesq_wb, estoi, si_sdr) — noisy scored against clean.
PAIR_GOLDENS = [
    ("VBD/train", "p226_001.wav", 1.775214, 0.560625, 12.273180),
    ("VBD_SNR-5/train", "p226_001.wav", 1.207809, 0.179585, -4.810069),
    ("VBD_SNR-5/train2", "p286_001.wav", 2.056845, 0.597454, 12.761250),
    ("VBD_SNR-5/valid", "p232_001.wav", 3.538361, 0.831219, 15.469565),
    ("VBD_SNR-5/valid2", "p232_001.wav", 2.309636, 0.639419, -5.036239),
]

# deep_eval remix of the valid pair: y = x + (y0)*10^(-(snr+5)/20)
# (snr, pesq_wb, estoi, si_sdr)
REMIX_GOLDENS = [
    (-5.0, 3.538361, 0.831219, 15.469565),
    (5.0, 4.091684, 0.894149, 25.471912),
    (15.0, 4.517626, 0.952228, 35.472652),
]


def _load_pair(subset, name):
    x, _ = read_wav(os.path.join(_ROOT, subset, "clean", name))
    y, _ = read_wav(os.path.join(_ROOT, subset, "noisy", name))
    x1, y1 = x[0], y[0]
    n = min(len(x1), len(y1))
    return x1[:n], y1[:n]


@pytest.mark.parametrize("subset,name,g_pesq,g_estoi,g_sisdr", PAIR_GOLDENS)
def test_pair_metric_goldens(subset, name, g_pesq, g_estoi, g_sisdr):
    x, y = _load_pair(subset, name)
    assert pesq_wb(16000, x, y) == pytest.approx(g_pesq, abs=2e-4)
    assert float(estoi(x, y, 16000)) == pytest.approx(g_estoi, abs=2e-4)
    assert float(si_sdr(x, y)) == pytest.approx(g_sisdr, abs=2e-3)


@pytest.mark.parametrize("snr,g_pesq,g_estoi,g_sisdr", REMIX_GOLDENS)
def test_remix_metric_goldens(snr, g_pesq, g_estoi, g_sisdr):
    """SNR-swept remixes exercise the metrics across the quality range the
    deep_eval harness reports (-5 dB mixture up to near-transparent)."""
    x, y = _load_pair("VBD_SNR-5/valid", "p232_001.wav")
    yr = (x + (y - x) * 10 ** (-(snr + 5) / 20)).astype(np.float32)
    assert pesq_wb(16000, x, yr) == pytest.approx(g_pesq, abs=2e-4)
    assert float(estoi(x, yr, 16000)) == pytest.approx(g_estoi, abs=2e-4)
    assert float(si_sdr(x, yr)) == pytest.approx(g_sisdr, abs=2e-3)
