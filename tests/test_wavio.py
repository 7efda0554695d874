"""WAV reader/writer round-trip tests."""

import numpy as np
import pytest

from diffse_tpu.data import read_wav, write_wav


# pcm16 writes with 32767 scaling but reads with /32768 (torchaudio convention),
# so round-trip error is bounded by ~2 LSB.
@pytest.mark.parametrize("subtype,atol", [("pcm16", 2 / 32768), ("float32", 0)])
def test_roundtrip_mono(tmp_path, rng, subtype, atol):
    x = (rng.standard_normal(16000) * 0.2).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "test.wav")
    write_wav(path, x, 16000, subtype=subtype)
    back, sr = read_wav(path)
    assert sr == 16000
    assert back.shape == (1, 16000)
    np.testing.assert_allclose(back[0], x, atol=atol + 1e-7)


def test_roundtrip_stereo(tmp_path, rng):
    x = (rng.standard_normal((2, 8000)) * 0.1).astype(np.float32)
    path = str(tmp_path / "st.wav")
    write_wav(path, x, 48000, subtype="float32")
    back, sr = read_wav(path)
    assert sr == 48000
    np.testing.assert_allclose(back, x, atol=1e-7)


def test_pcm16_matches_torchaudio_scaling(tmp_path):
    """PCM16 decode divides by 32768 (torchaudio convention)."""
    import struct

    samples = np.array([0, 16384, -32768, 32767], dtype="<i2")
    path = str(tmp_path / "manual.wav")
    payload = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    back, _ = read_wav(path)
    np.testing.assert_allclose(back[0], samples.astype(np.float32) / 32768.0)
