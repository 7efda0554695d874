"""Native C++ component tests: wav decode parity, remix+crop, upfirdn2d ref."""

import numpy as np
import pytest

from diffse_tpu.data.wavio import read_wav, write_wav
from diffse_tpu.native import get_lib, loader, upfirdn2d_native
from diffse_tpu.ops import setup_fir_kernel, upfirdn2d_numpy

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")


def test_native_wav_decode_matches_python(tmp_path, rng):
    x = (rng.standard_normal(12345) * 0.3).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, 16000, subtype="pcm16")
    ours = loader.read_wav_mono(path)
    ref, _ = read_wav(path)
    np.testing.assert_allclose(ours, ref[0], atol=1e-7)


def test_native_wav_decode_float32(tmp_path, rng):
    x = (rng.standard_normal(5000) * 0.1).astype(np.float32)
    path = str(tmp_path / "f.wav")
    write_wav(path, x, 16000, subtype="float32")
    ours = loader.read_wav_mono(path)
    np.testing.assert_allclose(ours, x, atol=1e-7)


def test_native_remix_crop(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    y = rng.standard_normal(1000).astype(np.float32)
    ox, oy = loader.remix_crop(x, y, 0.5, 400, start=100)
    np.testing.assert_allclose(ox, x[100:500], atol=1e-7)
    np.testing.assert_allclose(oy, x[100:500] + (y[100:500] - x[100:500]) * 0.5, atol=1e-6)

    # pad path (center pad)
    ox, oy = loader.remix_crop(x[:100], y[:100], 1.0, 300)
    assert ox.shape == (300,)
    np.testing.assert_allclose(ox[:100], 0.0)
    np.testing.assert_allclose(ox[100:200], x[:100], atol=1e-7)


def test_native_wav_len(tmp_path, rng):
    x = (rng.standard_normal(777) * 0.2).astype(np.float32)
    path = str(tmp_path / "l.wav")
    write_wav(path, x, 16000, subtype="pcm16")
    assert loader.wav_len(path) == 777


@pytest.mark.parametrize("n,target,shuffle", [(1000, 400, True), (1000, 400, False),
                                              (100, 300, True)])
def test_native_load_pair_matches_python(tmp_path, rng, n, target, shuffle):
    """Fused C++ decode+remix+crop == the numpy chain for crop, center, pad."""
    x = (rng.standard_normal(n) * 0.3).clip(-1, 1).astype(np.float32)
    y = (rng.standard_normal(n) * 0.3).clip(-1, 1).astype(np.float32)
    cp, np_ = str(tmp_path / "c.wav"), str(tmp_path / "n.wav")
    write_wav(cp, x, 16000, subtype="float32")
    write_wav(np_, y, 16000, subtype="float32")
    u, fixed_snr = 0.63, 0.5
    ox, oy = loader.load_pair(cp, np_, u, shuffle, fixed_snr, target)

    # numpy reference: remix then crop/pad (Specs.__getitem__ contract)
    yr = x + (y - x) * fixed_snr
    pad = max(target - n, 0)
    if pad == 0:
        start = int(u * (n - target)) if shuffle else int((n - target) / 2)
        rx, ry = x[start : start + target], yr[start : start + target]
    else:
        width = (pad // 2, pad // 2 + pad % 2)
        rx = np.pad(x, width)
        ry = np.pad(yr, width)
    np.testing.assert_allclose(ox, rx, atol=1e-7)
    np.testing.assert_allclose(oy, ry, atol=1e-6)


@pytest.mark.parametrize("up,down,pad", [(1, 1, (0, 0)), (2, 1, (4, 2)), (1, 2, (1, 1))])
def test_native_upfirdn2d_matches_numpy(rng, up, down, pad):
    x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
    k = setup_fir_kernel([1, 3, 3, 1])
    ours = upfirdn2d_native(x, k, up=up, down=down, pad=pad)
    ref = upfirdn2d_numpy(x, k, up=up, down=down, pad=pad)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)
