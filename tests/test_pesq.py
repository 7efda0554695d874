"""Native PESQ (ITU-T P.862.2) validation.

Without the ITU conformance dataset (zero-egress environment), the
implementation is pinned by:
  - table self-consistency invariants (partition identities, bin counts),
  - the identity anchor (max MOS-LQO = 4.6439 from the P.862.2 logistic),
  - monotonic degradation with noise level,
  - level- and delay-invariance (PESQ level-aligns and time-aligns),
  - real VoiceBank-DEMAND mixtures shipped with the reference repo, checked
    against the published mixture-score ballpark (Paper.pdf Table 1: the VBD
    test-set mixture averages PESQ-WB 1.97 at ~2.5-17.5 dB input SNR).
"""

import os

import numpy as np
import pytest

from diffse_tpu.evaluation import pesq_tables as T
from diffse_tpu.evaluation.pesq_native import pesq_wb_native, _mos_lqo_wb
from diffse_tpu.evaluation.metrics import pesq_wb

_REF_DATASET = "/root/reference/dataset"
_HAVE_VBD = os.path.isdir(_REF_DATASET)

FS = 16000


def _speech_like(seconds=3.0, seed=0):
    """AM-modulated harmonic complex with pauses — synthetic speech stand-in."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    env = (np.sin(2 * np.pi * 2.3 * t) ** 2) * (t % 1.0 < 0.7)
    x = env * sum(
        np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6)) / (i + 1)
        for i, f0 in enumerate([120, 240, 360, 480, 720, 1100, 1800, 2600])
    )
    return (x / np.max(np.abs(x)) * 0.3).astype(np.float64)


def _vbd(subdir, kind):
    base = os.path.join(_REF_DATASET, subdir, kind)
    f = sorted(os.listdir(base))[0]
    from diffse_tpu.data.wavio import read_wav

    x, sr = read_wav(os.path.join(base, f))
    assert sr == FS
    return np.asarray(x).squeeze()


# ----------------------------------------------------------- table invariants

def test_tables_bin_partition_covers_full_band():
    assert T.NR_OF_HZ_BANDS_PER_BARK_BAND.sum() == 256  # 256 bins * 31.25 Hz = 8 kHz
    assert len(T.NR_OF_HZ_BANDS_PER_BARK_BAND) == T.NB == 49


def test_tables_centre_width_partition_identity():
    # centre spacing equals the mean of adjacent widths on the Bark scale
    # (true partition); on the Hz scale the identity only holds where the
    # Bark warping is near-linear (below ~1 kHz) — above that the Hz widths
    # are the warped images of the Bark widths, not a partition.
    spacing = np.diff(T.CENTRE_OF_BAND_BARK)
    expected = (T.WIDTH_OF_BAND_BARK[:-1] + T.WIDTH_OF_BAND_BARK[1:]) / 2
    np.testing.assert_allclose(spacing, expected, rtol=2e-3)

    low = T.CENTRE_OF_BAND_HZ < 1000.0
    spacing_hz = np.diff(T.CENTRE_OF_BAND_HZ)[low[:-1] & low[1:]]
    expected_hz = ((T.WIDTH_OF_BAND_HZ[:-1] + T.WIDTH_OF_BAND_HZ[1:]) / 2)[
        low[:-1] & low[1:]
    ]
    np.testing.assert_allclose(spacing_hz, expected_hz, rtol=0.05)


def test_tables_pow_dens_correction_matches_bin_counts():
    np.testing.assert_allclose(
        T.POW_DENS_CORRECTION_FACTOR, 100.0 / T.NR_OF_HZ_BANDS_PER_BARK_BAND,
        rtol=1e-5,
    )


def test_tables_bin_groups_track_band_centres():
    """The centre of each band's bin group must track centre_of_band_hz to
    within one bin width (the last band is Nyquist-truncated)."""
    edges = np.concatenate([[0], np.cumsum(T.NR_OF_HZ_BANDS_PER_BARK_BAND)])
    group_centre = (edges[:-1] + (T.NR_OF_HZ_BANDS_PER_BARK_BAND - 1) / 2) * 31.25
    err = np.abs(group_centre[:-1] - T.CENTRE_OF_BAND_HZ[:-1])
    assert np.max(err) < 31.25, f"max deviation {np.max(err):.1f} Hz"


def test_tables_monotone_positive():
    assert np.all(np.diff(T.CENTRE_OF_BAND_BARK) > 0)
    assert np.all(np.diff(T.CENTRE_OF_BAND_HZ) > 0)
    assert np.all(T.WIDTH_OF_BAND_BARK > 0)
    assert np.all(T.ABS_THRESH_POWER > 0)


# ------------------------------------------------------------------- anchors

def test_identity_is_max_mos():
    """Equal signals have zero disturbance -> raw 4.5 -> MOS-LQO 4.6439."""
    x = _speech_like()
    score = pesq_wb_native(x, x)
    np.testing.assert_allclose(score, float(_mos_lqo_wb(4.5)), atol=1e-6)
    np.testing.assert_allclose(score, 4.6439, atol=1e-3)


def test_identity_is_scale_invariant():
    x = _speech_like()
    np.testing.assert_allclose(pesq_wb_native(x, 0.23 * x), 4.6439, atol=1e-3)


def test_monotone_in_noise_level():
    x = _speech_like()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(x))
    noise /= np.linalg.norm(noise)
    scores = []
    for snr in (40, 25, 10):
        n = noise * np.linalg.norm(x) * 10 ** (-snr / 20)
        scores.append(pesq_wb_native(x, x + n))
    assert scores[0] > scores[1] > scores[2], scores
    assert all(1.0 <= s <= 4.65 for s in scores), scores


def test_level_invariance_of_degraded():
    """PESQ level-aligns both inputs: +-10 dB on deg must not change the
    score (the alignment is exact, so bit-equal)."""
    x = _speech_like()
    rng = np.random.default_rng(2)
    n = rng.standard_normal(len(x))
    y = x + n / np.linalg.norm(n) * np.linalg.norm(x) * 10 ** (-20 / 20)
    base = pesq_wb_native(x, y)
    for g in (10 ** 0.5, 10 ** -0.5):
        np.testing.assert_allclose(pesq_wb_native(x, g * y), base, atol=0.01)


def test_delay_robustness():
    """Time alignment must absorb constant delays (score drift small)."""
    x = _speech_like()
    rng = np.random.default_rng(3)
    n = rng.standard_normal(len(x))
    y = x + n / np.linalg.norm(n) * np.linalg.norm(x) * 10 ** (-20 / 20)
    base = pesq_wb_native(x, y)
    for d in (500, 2000):
        yd = np.concatenate([np.zeros(d), y])
        assert abs(pesq_wb_native(x, yd) - base) < 0.1, d


def test_silence_returns_nan():
    x = np.zeros(FS * 2)
    with pytest.warns(UserWarning):
        assert np.isnan(pesq_wb_native(x, x))


def test_requires_16k():
    with pytest.raises(ValueError):
        pesq_wb_native(np.zeros(16000), np.zeros(16000), fs=8000)


def test_metrics_pesq_wb_integration():
    """The metric surface the eval harnesses call must return finite scores
    (the reference's call shape: pesq(16000, ref, deg, 'wb'))."""
    x = _speech_like(2.0)
    assert 4.5 < pesq_wb(FS, x, x) <= 4.65
    assert np.isnan(pesq_wb(FS, np.zeros(FS), np.zeros(FS)))


# -------------------------------------------------- real-speech soft anchors

@pytest.mark.skipif(not _HAVE_VBD, reason="reference VBD fixtures not present")
def test_vbd_mixture_scores_in_published_ballpark():
    """Shipped VoiceBank-DEMAND files: the ~12 dB original-trainset mixture
    must score near the published test-set mixture average (1.97, Paper.pdf
    Table 1, over 2.5-17.5 dB inputs), and the -5 dB remix near the PESQ
    floor. Wide tolerances: single files vs an 824-file average."""
    x = _vbd("VBD/train", "clean")
    y = _vbd("VBD/train", "noisy")
    mix = pesq_wb_native(x, y)
    assert 1.3 < mix < 2.5, mix

    x5 = _vbd("VBD_SNR-5/train", "clean")
    y5 = _vbd("VBD_SNR-5/train", "noisy")
    mix5 = pesq_wb_native(x5, y5)
    assert 1.0 < mix5 < 1.5, mix5
    assert mix5 < mix


@pytest.mark.skipif(not _HAVE_VBD, reason="reference VBD fixtures not present")
def test_vbd_snr_sweep_monotone():
    """Remixing the shipped clean/noise pair over input SNRs must produce
    monotonically increasing PESQ (the deep_eval sweep contract,
    deep_eval.py:112-118)."""
    x = _vbd("VBD/train", "clean")
    n = _vbd("VBD/train", "noise")
    L = min(len(x), len(n))
    x, n = x[:L], n[:L]
    scores = []
    for snr in (0, 10, 20, 30):
        g = np.linalg.norm(x) / (np.linalg.norm(n) + 1e-12) * 10 ** (-snr / 20)
        scores.append(pesq_wb_native(x, x + g * n))
    assert scores == sorted(scores), scores
    assert scores[-1] > 3.0, scores  # 30 dB real-noise mixture is near-clean


# ------------------------------------------------- mid-utterance delay jumps

def _with_delay_jump(x, jump_at_s=1.5, jump_ms=20.0):
    """Degraded copy whose delay jumps by +jump_ms at jump_at_s (samples
    repeated at the jump point, as a transmission stall would)."""
    cut = int(jump_at_s * FS)
    gap = int(jump_ms * FS / 1000.0)
    return np.concatenate([x[:cut], x[cut - gap : cut], x[cut:]])[: len(x) + gap]


def _one_long_burst(seconds=3.5, seed=7):
    """Aperiodic speech stand-in: one continuous 300-3400 Hz noise burst
    (0.3 s .. seconds-0.8 s) with AM, silence elsewhere. The VAD sees a
    SINGLE long utterance (so only split_align can recover an internal delay
    jump), and the aperiodic carrier gives an unambiguous cross-correlation
    peak (a harmonic complex would alias the jump onto its pitch period)."""
    rng = np.random.default_rng(seed)
    n_tot = int(seconds * FS)
    t = np.arange(n_tot) / FS
    spec = np.fft.rfft(rng.standard_normal(n_tot))
    freqs = np.fft.rfftfreq(n_tot, 1 / FS)
    spec[(freqs < 300) | (freqs > 3400)] = 0
    carrier = np.fft.irfft(spec, n_tot)
    env = ((t > 0.3) & (t < seconds - 0.8)) * (
        0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t) ** 2)
    x = carrier * env
    return x / np.max(np.abs(x)) * 0.3


def _locate(P, x, deg):
    n = max(len(x), len(deg))
    n_samples = n + 2 * P._BUF

    def _buf(v):
        b = np.zeros(n_samples + P.DATAPADDING)
        b[P._BUF : P._BUF + len(v)] = v
        return b

    ref_b = P._wb_input_filter(P._fix_power_level(_buf(x), n_samples, n_samples))
    deg_b = P._wb_input_filter(P._fix_power_level(_buf(deg), n_samples, n_samples))
    return ref_b, deg_b, n_samples


def test_utterance_split_detects_delay_jump():
    """A +20 ms delay jump inside a single long utterance must be re-split
    into utterances whose delays differ by the jump (the standard's
    utterance_split path)."""
    from diffse_tpu.evaluation import pesq_native as P

    x = _one_long_burst()
    deg = _with_delay_jump(x, 1.5, 20.0)
    ref_b, deg_b, n_samples = _locate(P, x, deg)
    spans = P._id_utterances(P._apply_vad(ref_b, n_samples)[0])
    assert len(spans) == 1  # precondition: VAD sees one utterance
    utts, delays = P._utterance_locate(ref_b, deg_b, n_samples)
    assert len(utts) == 2
    jump = int(0.020 * FS)
    assert abs((delays[1] - delays[0]) - jump) <= P.DOWNSAMPLE, delays
    # split point within one alignment frame of the true jump
    true_cut = P._BUF + int(1.5 * FS)
    assert abs(utts[0][1] - true_cut) <= P.ALIGN_NFFT // 2


def test_utterance_split_no_false_split_on_uniform_delay():
    """A uniformly delayed degraded signal must NOT be split."""
    from diffse_tpu.evaluation import pesq_native as P

    for mk, seed in ((_one_long_burst, 3), (_speech_like, 4)):
        x = mk(3.5, seed)
        deg = np.concatenate([np.zeros(int(0.030 * FS)), x])
        ref_b, deg_b, n_samples = _locate(P, x, deg)
        utts, delays = P._utterance_locate(ref_b, deg_b, n_samples)
        spans = P._id_utterances(P._apply_vad(ref_b, n_samples)[0])
        assert len(utts) == len(spans)  # split pass added nothing
        for d in delays:
            assert abs(d - int(0.030 * FS)) <= P.DOWNSAMPLE


def test_delay_jump_scores_better_with_split():
    """Scoring a delay-jumped but otherwise clean signal must not collapse:
    the split machinery realigns the post-jump half (measured: 4.58 MOS with
    the split vs 2.75 with it disabled)."""
    x = _one_long_burst(seed=5)
    deg = _with_delay_jump(x, 1.5, 20.0)
    mos = pesq_wb_native(x, deg)
    assert mos > 4.0, mos
