"""Op parity tests: upfirdn2d (XLA conv formulation vs numpy reference vs the
reference semantics re-derived in torch), FIR resampling, fused bias-act."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.ops import (
    conv_downsample_2d,
    downsample_2d,
    fused_bias_leaky_relu,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_fir_kernel,
    upfirdn2d,
    upfirdn2d_numpy,
    upsample_2d,
    upsample_conv_2d,
)

FIR = [1, 3, 3, 1]


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (0, 0)),
        (1, 1, (2, 1)),
        (2, 1, (2, 1)),
        (2, 1, (4, 2)),  # upsample_2d config for FIR len 4, factor 2
        (1, 2, (1, 1)),
        (2, 2, (1, 1)),
        (1, 1, (-1, 2)),  # negative padding
    ],
)
def test_upfirdn2d_matches_numpy_reference(rng, up, down, pad):
    x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)  # NCHW
    k = setup_fir_kernel(FIR)
    ours = _nchw(upfirdn2d(_nhwc(x), jnp.asarray(k), up=up, down=down, pad=pad))
    ref = upfirdn2d_numpy(x, k, up=up, down=down, pad=pad)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upfirdn2d_numpy_against_torch_spec(rng):
    """Validate our numpy reference against an independent torch derivation
    (zero-stuff -> pad -> conv2d with flipped kernel -> decimate), i.e. the
    documented semantics of op/upfirdn2d.py:159-200."""
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 2, 7, 8)).astype(np.float32)
    k = setup_fir_kernel(FIR)
    up, down, pad = 2, 1, (3, 1)

    t = torch.from_numpy(x).reshape(-1, 7, 8, 1)
    out = t.view(-1, 7, 1, 8, 1, 1)
    out = F.pad(out, [0, 0, 0, up - 1, 0, 0, 0, up - 1])
    out = out.view(-1, 14, 16, 1)
    out = F.pad(out, [0, 0, pad[0], pad[1], pad[0], pad[1]])
    out = out.permute(0, 3, 1, 2)
    kt = torch.flip(torch.from_numpy(k), [0, 1]).view(1, 1, 4, 4)
    out = F.conv2d(out, kt)
    out = out[:, 0][:, ::down, ::down]
    expected = out.view(1, 2, out.shape[1], out.shape[2]).numpy()

    ref = upfirdn2d_numpy(x, k, up=up, down=down, pad=pad)
    np.testing.assert_allclose(ref, expected, atol=1e-5)


def test_upsample_2d_shape_and_dc_gain(rng):
    """Constant inputs stay constant under the normalized FIR (gain=1)."""
    x = jnp.ones((1, 8, 8, 3))
    y = upsample_2d(x, FIR, factor=2)
    assert y.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(y)[:, 4:-4, 4:-4], 1.0, atol=1e-5)


def test_downsample_2d_shape_and_dc_gain():
    x = jnp.ones((1, 16, 16, 3))
    y = downsample_2d(x, FIR, factor=2)
    assert y.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y)[:, 2:-2, 2:-2], 1.0, atol=1e-5)


def test_up_down_roundtrip_identity_center(rng):
    """up2 then down2 with the same FIR is near-identity away from borders for
    band-limited inputs (the FIR is a low-pass; white noise would decorrelate)."""
    i, j = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    sig = np.sin(2 * np.pi * i / 16.0) + np.cos(2 * np.pi * j / 16.0)
    x = jnp.asarray(sig.astype(np.float32)[None, :, :, None])
    y = downsample_2d(upsample_2d(x, FIR, 2), FIR, 2)
    assert y.shape == x.shape
    a = np.asarray(x)[0, 4:-4, 4:-4, 0].ravel()
    b = np.asarray(y)[0, 4:-4, 4:-4, 0].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99


def test_upsample_conv_2d_matches_torch(rng):
    """Parity of the fused upsample+conv against the reference composition
    re-derived with torch ops (up_or_down_sampling.py:72-141)."""
    import torch
    import torch.nn.functional as F

    cin, cout, kk = 3, 5, 3
    x = rng.standard_normal((2, cin, 8, 9)).astype(np.float32)
    w = rng.standard_normal((cout, cin, kk, kk)).astype(np.float32)
    k = setup_fir_kernel(FIR) * 4  # gain * factor**2

    # torch reference path
    xt = torch.from_numpy(x)
    wt = torch.from_numpy(w)
    num_groups = 1
    wt2 = wt.reshape(num_groups, -1, cin, kk, kk)
    wt2 = torch.flip(wt2, [3, 4]).permute(0, 2, 1, 3, 4)
    wt2 = wt2.reshape(num_groups * cin, -1, kk, kk)
    ht = F.conv_transpose2d(xt, wt2, stride=2, padding=0)
    p = (k.shape[0] - 2) - (kk - 1)
    expected = upfirdn2d_numpy(ht.numpy(), k, pad=((p + 1) // 2 + 1, p // 2 + 1))

    # ours (NHWC/HWIO)
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    ours = _nchw(upsample_conv_2d(_nhwc(x), w_hwio, k=FIR, factor=2))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_conv_downsample_2d_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    cin, cout, kk = 3, 4, 3
    x = rng.standard_normal((2, cin, 12, 12)).astype(np.float32)
    w = rng.standard_normal((cout, cin, kk, kk)).astype(np.float32)
    k = setup_fir_kernel(FIR)

    p = (k.shape[0] - 2) + (kk - 1)
    filtered = upfirdn2d_numpy(x, k, pad=((p + 1) // 2, p // 2))
    expected = F.conv2d(torch.from_numpy(filtered), torch.from_numpy(w), stride=2).numpy()

    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    ours = _nchw(conv_downsample_2d(_nhwc(x), w_hwio, k=FIR, factor=2))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_naive_resampling(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    up = naive_upsample_2d(x, 2)
    assert up.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(up)[0, :2, :2, 0], np.asarray(x)[0, 0, 0, 0])
    down = naive_downsample_2d(up, 2)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-6)


def test_fused_bias_leaky_relu(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    b = jnp.asarray([0.5, -0.5, 0.0])
    out = np.asarray(fused_bias_leaky_relu(x, b))
    xb = np.asarray(x) + np.array([0.5, -0.5, 0.0])
    expected = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2)
    np.testing.assert_allclose(out, expected, atol=1e-6)


@pytest.mark.parametrize(
    "stride,padding,output_padding,dilation",
    [
        ((1, 1), (0, 0), (0, 0), (1, 1)),
        ((2, 2), (2, 2), (0, 0), (1, 1)),
        ((2, 1), (2, 2), (1, 0), (2, 1)),  # DilDCUNet-v2 style
        ((2, 2), (1, 1), (1, 1), (1, 1)),
    ],
)
def test_conv_transpose2d_matches_torch(rng, stride, padding, output_padding, dilation):
    """ops.convt.conv_transpose2d vs torch.nn.functional.conv_transpose2d."""
    import torch
    import torch.nn.functional as F

    from diffse_tpu.ops.convt import conv_transpose2d

    cin, cout, kh, kw = 3, 5, 4, 4
    x = rng.standard_normal((2, cin, 7, 9)).astype(np.float32)
    w = rng.standard_normal((cin, cout, kh, kw)).astype(np.float32)  # torch IOHW

    expected = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=stride, padding=padding,
        output_padding=output_padding, dilation=dilation,
    ).numpy()

    # ours: NHWC input, HWIO kernel with I=in, O=out
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))
    ours = conv_transpose2d(x_nhwc, w_hwio, stride, padding, output_padding, dilation)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=2e-4)
