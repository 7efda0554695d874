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


# ------------------------------------------------- ESTOI golden-value tests
# (independent derivations, not re-runs of the production code paths)


def test_thirdoct_band_edges_hand_derived():
    """The 15 one-third-octave bands (fs=10k, nfft=512, 150 Hz base) must
    cover exactly the DFT bins [round(fl/df), round(fh/df)) with
    fl = 150*2^((2k-1)/6), fh = 150*2^((2k+1)/6), df = 10000/512 — the
    nearest-bin band-matrix definition of Taal et al. (2011) used by the
    reference's scorer (pystoi, sgmse/util/inference.py:317-318).

    The expected indices here are hand-derived with independent arithmetic
    (round of frequency/bin-width), not with the production argmin code."""
    from diffse_tpu.evaluation.metrics import _thirdoct

    obm = _thirdoct(10000, 512, 15, 150)
    assert obm.shape == (15, 257)
    df = 10000.0 / 512.0
    for k in range(15):
        fl = 150.0 * 2.0 ** ((2 * k - 1) / 6.0)
        fh = 150.0 * 2.0 ** ((2 * k + 1) / 6.0)
        lo = int(np.round(fl / df))
        hi = int(np.round(fh / df))
        expected = np.zeros(257)
        expected[lo:hi] = 1.0
        np.testing.assert_array_equal(obm[k], expected, err_msg=f"band {k}")
    # adjacent bands tile without gaps or overlap and stay in-range
    total = obm.sum(axis=0)
    assert np.all(total <= 1.0)
    first = np.argmax(obm[0])
    last = 256 - np.argmax(obm[-1][::-1])
    assert np.all(total[first:last] == 1.0)


def _estoi_paper_reference(x, y, fs):
    """Loop-based ESTOI written directly from Jensen & Taal (2016) Eqs. 1-5,
    sharing no code with the production implementation beyond numpy/scipy:

      1. resample to 10 kHz, remove frames >40 dB below the loudest frame
         (256-sample Hann frames, 50% overlap), overlap-add the survivors;
      2. magnitude STFT (256-sample frames zero-padded to 512), third-octave
         band energies via the hand-derived band matrix above;
      3. for every length-30 segment: mean/variance-normalize each band row,
         then each time column, of both spectrograms;
      4. d_m = (1/N) sum_{n,j} xbar_{j,n} ybar_{j,n}; ESTOI = mean_m d_m.
    """
    import scipy.signal

    x = np.asarray(x, np.float64).squeeze()
    y = np.asarray(y, np.float64).squeeze()
    if fs != 10000:
        g = np.gcd(int(fs), 10000)
        x = scipy.signal.resample_poly(x, 10000 // g, int(fs) // g)
        y = scipy.signal.resample_poly(y, 10000 // g, int(fs) // g)

    N_FRAME, HOP, NFFT, J, N_SEG = 256, 128, 512, 15, 30
    w = np.hanning(N_FRAME + 2)[1:-1]
    eps = np.finfo(np.float64).eps

    # silent-frame removal (energy per windowed clean frame)
    n_frames = 1 + (len(x) - N_FRAME) // HOP
    keep = []
    energies = []
    for i in range(n_frames):
        fr = x[i * HOP : i * HOP + N_FRAME] * w
        energies.append(20 * np.log10(np.linalg.norm(fr) + eps))
    energies = np.asarray(energies)
    thresh = np.max(energies) - 40
    keep = [i for i in range(n_frames) if energies[i] > thresh]
    xs = np.zeros((len(keep) - 1) * HOP + N_FRAME)
    ys = np.zeros_like(xs)
    for out_i, i in enumerate(keep):
        xs[out_i * HOP : out_i * HOP + N_FRAME] += x[i * HOP : i * HOP + N_FRAME] * w
        ys[out_i * HOP : out_i * HOP + N_FRAME] += y[i * HOP : i * HOP + N_FRAME] * w

    # third-octave band magnitudes
    df = 10000.0 / NFFT
    band_bins = [
        (int(np.round(150.0 * 2.0 ** ((2 * k - 1) / 6.0) / df)),
         int(np.round(150.0 * 2.0 ** ((2 * k + 1) / 6.0) / df)))
        for k in range(J)
    ]
    m_frames = 1 + (len(xs) - N_FRAME) // HOP
    X = np.zeros((J, m_frames))
    Y = np.zeros((J, m_frames))
    for i in range(m_frames):
        xf = np.abs(np.fft.rfft(xs[i * HOP : i * HOP + N_FRAME] * w, NFFT))
        yf = np.abs(np.fft.rfft(ys[i * HOP : i * HOP + N_FRAME] * w, NFFT))
        for j, (lo, hi) in enumerate(band_bins):
            X[j, i] = np.sqrt(np.sum(xf[lo:hi] ** 2))
            Y[j, i] = np.sqrt(np.sum(yf[lo:hi] ** 2))

    # segment correlations
    scores = []
    for m in range(N_SEG, m_frames + 1):
        xm = X[:, m - N_SEG : m].copy()
        ym = Y[:, m - N_SEG : m].copy()
        for a in (xm, ym):  # row normalization (Eq. 3)
            a -= a.mean(axis=1, keepdims=True)
            a /= (np.linalg.norm(a, axis=1, keepdims=True) + eps)
        for a in (xm, ym):  # column normalization (Eq. 4)
            a -= a.mean(axis=0, keepdims=True)
            a /= (np.linalg.norm(a, axis=0, keepdims=True) + eps)
        scores.append(np.sum(xm * ym) / N_SEG)
    return float(np.mean(scores))


@pytest.mark.parametrize("snr_db", [0.0, 10.0, 20.0])
def test_estoi_matches_independent_paper_implementation(rng, snr_db):
    """Absolute golden values: the production ESTOI must match the loop-based
    paper derivation above on noisy fixtures to numerical precision. ESTOI
    drives checkpoint top-k selection (train.py:98-101), so a numeric drift
    would silently reorder retained checkpoints."""
    # amplitude-modulated tone + bursts: speech-like band envelopes, and the
    # silence gap exercises the silent-frame removal path
    t = np.arange(32000) / 16000.0
    x = (np.sin(2 * np.pi * 311.0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t)))
    x[8000:10000] *= 0.001  # a silent stretch that must be removed
    x = x.astype(np.float64)
    noise = rng.standard_normal(len(x))
    noise *= np.linalg.norm(x) / np.linalg.norm(noise) * 10 ** (-snr_db / 20)
    y = x + noise

    ours = estoi(x, y, 16000)
    ref = _estoi_paper_reference(x, y, 16000)
    assert np.isfinite(ours) and np.isfinite(ref)
    np.testing.assert_allclose(ours, ref, atol=1e-10)
    assert 0.0 < ref < 1.0


def test_stoi_classic_matches_independent_clipped_correlation(rng):
    """Classic STOI golden value via an independent loop-based derivation of
    the clipped-correlation measure (Taal et al. 2011 Eqs. 5-7)."""
    from diffse_tpu.evaluation.metrics import _remove_silent_frames, _stft_mag, _thirdoct

    t = np.arange(30000) / 16000.0
    x = np.sin(2 * np.pi * 233.0 * t) * (0.5 + 0.5 * np.square(np.sin(2 * np.pi * 2.3 * t)))
    y = x + 0.3 * rng.standard_normal(len(x))

    ours = stoi(x, y, 16000, extended=False)

    # independent evaluation on top of the (already golden-tested) band
    # energies: explicit per-band clipped correlation loop
    import scipy.signal

    xr = scipy.signal.resample_poly(x, 5, 8)
    yr = scipy.signal.resample_poly(y, 5, 8)
    xs, ys = _remove_silent_frames(xr, yr, 40, 256, 128)
    X = np.sqrt(_thirdoct(10000, 512, 15, 150) @ (_stft_mag(xs, 256, 128, 512) ** 2))
    Y = np.sqrt(_thirdoct(10000, 512, 15, 150) @ (_stft_mag(ys, 256, 128, 512) ** 2))
    eps = np.finfo(np.float64).eps
    c = 10 ** (15 / 20.0)
    vals = []
    for m in range(30, X.shape[1] + 1):
        for j in range(15):
            xj = X[j, m - 30 : m]
            yj = Y[j, m - 30 : m]
            alpha = np.sqrt(np.sum(xj**2) / (np.sum(yj**2) + eps))
            yj = np.minimum(alpha * yj, (1 + c) * xj)
            xd = xj - xj.mean()
            yd = yj - yj.mean()
            vals.append(np.sum(xd * yd) / (np.linalg.norm(xd) * np.linalg.norm(yd) + eps))
    np.testing.assert_allclose(ours, np.mean(vals), atol=1e-10)
