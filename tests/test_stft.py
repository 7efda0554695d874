"""STFT/iSTFT parity against torch.stft/istft (the reference's semantics).

The data contract (sgmse/data_module.py:184-187) is n_fft=510, hop=128,
periodic hann, center=True. PESQ parity within 0.02 requires these transforms
to be bit-faithful, so we compare directly against torch-cpu golden values.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffse_tpu.transforms import stft, istft, hann_window, sqrthann_window

N_FFT, HOP = 510, 128


def _torch_stft(x, n_fft=N_FFT, hop=HOP):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft, periodic=True),
        center=True,
        return_complex=True,
    ).numpy()


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(N_FFT))
    theirs = torch.hann_window(N_FFT, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_sqrthann_window_matches_torch():
    ours = np.asarray(sqrthann_window(N_FFT))
    theirs = torch.sqrt(torch.hann_window(N_FFT, periodic=True)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("length", [(256 - 1) * HOP, 16000, 32001])
def test_stft_matches_torch(rng, length):
    x = rng.standard_normal(length).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), hann_window(N_FFT), n_fft=N_FFT, hop_length=HOP))
    theirs = _torch_stft(x)
    assert ours.shape == theirs.shape
    assert ours.shape[0] == 256  # 510 // 2 + 1
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_stft_batched(rng):
    x = rng.standard_normal((3, 16000)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), hann_window(N_FFT), n_fft=N_FFT, hop_length=HOP))
    for i in range(3):
        np.testing.assert_allclose(ours[i], _torch_stft(x[i]), atol=2e-4)


@pytest.mark.parametrize("length", [(256 - 1) * HOP, 16000])
def test_istft_matches_torch(rng, length):
    x = rng.standard_normal(length).astype(np.float32)
    spec = _torch_stft(x)
    theirs = torch.istft(
        torch.from_numpy(spec),
        n_fft=N_FFT,
        hop_length=HOP,
        window=torch.hann_window(N_FFT, periodic=True),
        center=True,
        length=length,
    ).numpy()
    ours = np.asarray(
        istft(jnp.asarray(spec), hann_window(N_FFT), n_fft=N_FFT, hop_length=HOP, length=length)
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_roundtrip(rng):
    """istft(stft(x)) == x up to numerical precision (away from edges torch
    guarantees perfect COLA reconstruction for hann/hop=n_fft/4-ish setups)."""
    length = 32640
    x = rng.standard_normal(length).astype(np.float32)
    w = hann_window(N_FFT)
    spec = stft(jnp.asarray(x), w, n_fft=N_FFT, hop_length=HOP)
    back = np.asarray(istft(spec, w, n_fft=N_FFT, hop_length=HOP, length=length))
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_istft_length_pad(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    spec = stft(jnp.asarray(x), hann_window(N_FFT), n_fft=N_FFT, hop_length=HOP)
    longer = istft(spec, hann_window(N_FFT), n_fft=N_FFT, hop_length=HOP, length=17000)
    assert longer.shape[-1] == 17000
    np.testing.assert_allclose(np.asarray(longer[16500:]), 0.0)


@pytest.mark.parametrize("method", ["fft", "conv"])
def test_stft_methods_match_torch(rng, method):
    """All three STFT formulations (matmul default, fft, conv) are equal."""
    x = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(
        stft(jnp.asarray(x), hann_window(N_FFT), n_fft=N_FFT, hop_length=HOP,
             method=method)
    )
    np.testing.assert_allclose(ours, _torch_stft(x), atol=2e-4)


@pytest.mark.parametrize("method", ["fft", "conv"])
def test_istft_methods_match_torch(rng, method):
    length = 16000
    x = rng.standard_normal(length).astype(np.float32)
    spec = _torch_stft(x)
    theirs = torch.istft(
        torch.from_numpy(spec), n_fft=N_FFT, hop_length=HOP,
        window=torch.hann_window(N_FFT, periodic=True), center=True, length=length,
    ).numpy()
    ours = np.asarray(
        istft(jnp.asarray(spec), hann_window(N_FFT), n_fft=N_FFT, hop_length=HOP,
              length=length, method=method)
    )
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_conv_stft_batched(rng):
    x = rng.standard_normal((3, 8000)).astype(np.float32)
    a = np.asarray(stft(jnp.asarray(x), hann_window(N_FFT), method="conv"))
    b = np.asarray(stft(jnp.asarray(x), hann_window(N_FFT), method="matmul"))
    np.testing.assert_allclose(a, b, atol=2e-4)
