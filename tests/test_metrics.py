"""Metric tests: SI-SDR golden values, active RMS, STOI/ESTOI invariants."""

import numpy as np
import pytest

from diffse_tpu.evaluation import (
    active_rms,
    energy_ratios,
    estoi,
    hp_filter,
    mean_conf_int,
    print_mean_std,
    si_sdr,
    snr_dB,
    stoi,
)


def test_si_sdr_perfect_reconstruction(rng):
    s = rng.standard_normal(16000)
    assert si_sdr(s, s.copy()) > 80  # essentially infinite


def test_si_sdr_scale_invariance(rng):
    s = rng.standard_normal(16000)
    noisy = s + 0.1 * rng.standard_normal(16000)
    assert si_sdr(s, noisy) == pytest.approx(si_sdr(s, 3.7 * noisy), abs=1e-6)


def test_si_sdr_known_value(rng):
    s = rng.standard_normal(16000)
    n = rng.standard_normal(16000)
    # orthogonalize noise against s so alpha == 1 and SDR is exactly the ratio
    n = n - (np.dot(n, s) / np.dot(s, s)) * s
    n *= np.linalg.norm(s) / np.linalg.norm(n) / 10 ** (10 / 20)  # -10 dB noise
    val = si_sdr(s, s + n)
    assert val == pytest.approx(10.0, abs=0.2)


def test_energy_ratios_decomposition(rng):
    s = rng.standard_normal(8000)
    n = rng.standard_normal(8000)
    s_hat = s + 0.3 * n
    sdr, sir, sar = energy_ratios(s_hat, s, n)
    assert sdr <= sir + 1e-9 and sdr <= sar + 1e-9


def test_active_rms_ignores_silence(rng):
    clean = rng.standard_normal(16000) * 0.1
    noise = np.concatenate([rng.standard_normal(8000) * 0.1, np.zeros(8000)])
    c, n = active_rms(clean, noise)
    # noise RMS measured only on the active half
    expected = np.sqrt(np.mean(noise[:8000] ** 2))
    assert n == pytest.approx(expected, rel=0.05)


def test_snr_db():
    s = np.ones(100)
    n = np.full(100, 0.1)
    assert snr_dB(s, n) == pytest.approx(20.0)


def test_hp_filter_removes_dc():
    x = np.ones(16000)
    y = hp_filter(x)
    assert np.abs(y[8000:]).max() < 1e-2


def test_mean_conf_int_and_fmt():
    m, h = mean_conf_int([1.0, 2.0, 3.0, 4.0])
    assert m == pytest.approx(2.5)
    assert print_mean_std([1.0, 2.0, 3.0]).startswith("2.00")


def _speechlike(rng, n=32000):
    """Modulated band-limited noise so silent-frame removal keeps frames."""
    t = np.arange(n) / 16000
    carrier = rng.standard_normal(n)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)
    import scipy.signal

    sos = scipy.signal.butter(4, [100 / 8000, 3500 / 8000], "bp", output="sos")
    return scipy.signal.sosfilt(sos, carrier) * env


def test_estoi_identity(rng):
    x = _speechlike(rng)
    assert estoi(x, x.copy(), 16000) > 0.99


def test_estoi_monotonic_with_noise(rng):
    x = _speechlike(rng)
    scores = []
    for noise_level in (0.01, 0.3, 2.0):
        y = x + noise_level * rng.standard_normal(len(x))
        scores.append(estoi(x, y, 16000))
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 0.9
    assert scores[2] < 0.5


def test_stoi_classic_identity(rng):
    x = _speechlike(rng)
    assert stoi(x, x.copy(), 16000) > 0.99


def test_stoi_range(rng):
    x = _speechlike(rng)
    y = x + 0.5 * rng.standard_normal(len(x))
    v = stoi(x, y, 16000, extended=False)
    assert 0.0 < v <= 1.0


def test_pesq_gated():
    from diffse_tpu.evaluation import pesq_wb, HAS_PESQ

    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    v = pesq_wb(16000, x, x)
    if HAS_PESQ:
        assert v > 4.0
    else:
        assert np.isnan(v)
