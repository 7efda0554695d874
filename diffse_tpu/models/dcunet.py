"""DCUNet: complex-valued U-Net backbone as flax.linen modules.

Re-design of sgmse/backbones/dcunet.py:100-627 in NHWC with complex-valued
feature maps. Four architectures (DCUNet-10/16/20, DilDCUNet-v2); complex
convolutions via the (f1(a)-f2(b)) + i(f1(b)+f2(a)) multiplication rule;
per-block (optionally complex) time embeddings; real/imag separate BatchNorm
("bN") or 2x2-whitening ComplexBatchNorm ("CbN").

Contract (dcunet.py:261-271): input complex spectrogram [B, 2, F, T] (x_t and
y as complex channels) with (F - 1) divisible by the encoder frequency-stride
product and (T - 1) divisible by the time-stride product (auto pad/trim).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convt import conv_transpose2d
from .shared import (
    BackboneRegistry,
    ComplexLinear,
    DiffusionStepEmbedding,
    GaussianFourierProjection,
)


def get_activation(name: str):
    if name == "silu":
        return jax.nn.silu
    elif name == "relu":
        return jax.nn.relu
    elif name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    else:
        raise NotImplementedError(f"Unknown activation: {name}")


def on_reim(fn, x):
    """Apply a real function to real/imag parts separately (dcunet.py:29-36)."""
    return fn(x.real) + 1j * fn(x.imag)


def unet_decoder_args(encoders, *, skip_connections):
    """Derive decoder args from encoder args (dcunet.py:41-62)."""
    decoder_args = []
    for enc_in, enc_out, k, s, p, d in reversed(encoders):
        skip_in = enc_out if (skip_connections and decoder_args) else 0
        decoder_args.append((enc_out + skip_in, enc_in, k, s, p, d))
    return tuple(decoder_args)


def make_unet_encoder_decoder_args(encoder_args, decoder_args):
    encoder_args = tuple(
        (
            in_ch,
            out_ch,
            tuple(k),
            tuple(s),
            tuple(n // 2 for n in k) if p == "auto" else tuple(p),
            tuple(d),
        )
        for in_ch, out_ch, k, s, p, d in encoder_args
    )
    if decoder_args == "auto":
        decoder_args = unet_decoder_args(encoder_args, skip_connections=True)
    else:
        decoder_args = tuple(
            (in_ch, out_ch, tuple(k), tuple(s),
             tuple(n // 2 for n in k) if p == "auto" else p, tuple(d), op)
            for in_ch, out_ch, k, s, p, d, op in decoder_args
        )
    return encoder_args, decoder_args


DCUNET_ARCHITECTURES = {
    "DCUNet-10": make_unet_encoder_decoder_args(
        (
            (1, 32, (7, 5), (2, 2), "auto", (1, 1)),
            (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        ),
        "auto",
    ),
    "DCUNet-16": make_unet_encoder_decoder_args(
        (
            (1, 32, (7, 5), (2, 2), "auto", (1, 1)),
            (32, 32, (7, 5), (2, 1), "auto", (1, 1)),
            (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        ),
        "auto",
    ),
    "DCUNet-20": make_unet_encoder_decoder_args(
        (
            (1, 32, (7, 1), (1, 1), "auto", (1, 1)),
            (32, 32, (1, 7), (1, 1), "auto", (1, 1)),
            (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
            (64, 64, (7, 5), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 90, (5, 3), (2, 1), "auto", (1, 1)),
        ),
        "auto",
    ),
    # architecture used in SGMSE / Interspeech paper
    "DilDCUNet-v2": make_unet_encoder_decoder_args(
        (
            (1, 32, (4, 4), (1, 1), "auto", (1, 1)),
            (32, 32, (4, 4), (1, 1), "auto", (1, 1)),
            (32, 32, (4, 4), (1, 1), "auto", (1, 1)),
            (32, 64, (4, 4), (2, 1), "auto", (2, 1)),
            (64, 128, (4, 4), (2, 2), "auto", (4, 1)),
            (128, 256, (4, 4), (2, 2), "auto", (8, 1)),
        ),
        "auto",
    ),
}


class _ComplexConv(nn.Module):
    """Complex conv: (f1(a) - f2(b)) + i(f1(b) + f2(a)), NHWC complex."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: tuple  # per-dim ints
    dilation: tuple = (1, 1)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pad = tuple((p, p) for p in self.padding)
        conv_re = nn.Conv(self.features, self.kernel_size, self.strides, pad,
                          kernel_dilation=self.dilation, use_bias=self.use_bias, name="re")
        conv_im = nn.Conv(self.features, self.kernel_size, self.strides, pad,
                          kernel_dilation=self.dilation, use_bias=self.use_bias, name="im")
        return (conv_re(x.real) - conv_im(x.imag)) + 1j * (conv_re(x.imag) + conv_im(x.real))


class _ComplexConvTranspose(nn.Module):
    """Complex transposed conv with explicit torch-style output_padding."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: tuple
    output_padding: tuple = (0, 0)
    dilation: tuple = (1, 1)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, output_size: Optional[tuple] = None):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        w_re = self.param("w_re", nn.initializers.lecun_normal(),
                          (kh, kw, in_ch, self.features))
        w_im = self.param("w_im", nn.initializers.lecun_normal(),
                          (kh, kw, in_ch, self.features))

        op = self.output_padding
        if output_size is not None:
            # torch's output_size -> output_padding resolution.
            op = []
            for ax, target in enumerate(output_size):
                base = (
                    (x.shape[1 + ax] - 1) * self.strides[ax]
                    - 2 * self.padding[ax]
                    + self.dilation[ax] * (self.kernel_size[ax] - 1)
                    + 1
                )
                op.append(target - base)
            op = tuple(op)

        def t(v, w):
            return conv_transpose2d(v, w, self.strides, self.padding, op, self.dilation)

        out = (t(x.real, w_re) - t(x.imag, w_im)) + 1j * (t(x.imag, w_re) + t(x.real, w_im))
        if self.use_bias:
            b_re = self.param("b_re", nn.initializers.zeros, (self.features,))
            b_im = self.param("b_im", nn.initializers.zeros, (self.features,))
            out = out + (b_re + 1j * b_im).reshape(1, 1, 1, -1)
        return out


class _OnReImBatchNorm(nn.Module):
    """Separate real/imag BatchNorm ("bN", dcunet.py:23-36, 336-342)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_re = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="re")
        bn_im = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="im")
        return bn_re(x.real) + 1j * bn_im(x.imag)


class ComplexBatchNorm(nn.Module):
    """Complex batch norm with 2x2 covariance whitening ("CbN",
    dcunet.py:456-627; track_running_stats=False, so purely batch statistics)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        wrr = self.param("Wrr", nn.initializers.ones, (c,))
        wri = self.param("Wri", nn.initializers.uniform(scale=1.8), (c,))  # ~U[-0.9,0.9] after shift
        wii = self.param("Wii", nn.initializers.ones, (c,))
        br = self.param("Br", nn.initializers.zeros, (c,))
        bi = self.param("Bi", nn.initializers.zeros, (c,))
        wri = wri - 0.9  # shift U[0,1.8] -> U[-0.9,0.9] (positive-definite-ish init)

        xr, xi = x.real, x.imag
        axes = (0, 1, 2)  # all but channel
        mr = jnp.mean(xr, axes, keepdims=True)
        mi = jnp.mean(xi, axes, keepdims=True)
        xr, xi = xr - mr, xi - mi

        vrr = jnp.mean(xr * xr, axes, keepdims=True) + self.eps
        vri = jnp.mean(xr * xi, axes, keepdims=True)
        vii = jnp.mean(xi * xi, axes, keepdims=True) + self.eps

        # inverse matrix square root of [[vrr, vri], [vri, vii]]
        tau = vrr + vii
        delta = vrr * vii - vri * vri
        s = jnp.sqrt(delta)
        t = jnp.sqrt(tau + 2 * s)
        rst = 1.0 / (s * t)
        urr = (s + vii) * rst
        uii = (s + vrr) * rst
        uri = -vri * rst

        zrr = wrr * urr + wri * uri
        zri = wrr * uri + wri * uii
        zir = wri * urr + wii * uri
        zii = wri * uri + wii * uii

        yr = zrr * xr + zri * xi + br
        yi = zir * xr + zii * xi + bi
        return yr + 1j * yi


def _get_norm(norm_type: str):
    if norm_type == "CbN":
        return ComplexBatchNorm
    elif norm_type == "bN":
        return _OnReImBatchNorm
    raise NotImplementedError(f"Unknown norm type: {norm_type}")


class _TembLayer(nn.Module):
    """Per-block time-embedding projection: optional extra ComplexLinear+act
    layers, then FeatureMapDense to out_chan (dcunet.py:379-390)."""

    embed_dim: int
    out_ch: int
    temb_layers: int
    temb_activation: str

    @nn.compact
    def __call__(self, t_embed):
        act = get_activation(self.temb_activation)
        h = t_embed
        for i in range(max(0, self.temb_layers - 1)):
            h = ComplexLinear(self.embed_dim, complex_valued=True, name=f"lin_{i}")(h)
            h = on_reim(act, h)
        h = ComplexLinear(self.out_ch, complex_valued=True, name="fmd")(h)
        h = h[:, None, None, :]
        return on_reim(act, h)


class DCUNetComplexEncoderBlock(nn.Module):
    """Encoder block: complex conv -> (+temb) -> norm -> activation
    (dcunet.py:345-396)."""

    out_ch: int
    kernel_size: tuple
    strides: tuple
    padding: tuple
    dilation: tuple
    norm_type: str = "bN"
    activation: str = "leaky_relu"
    embed_dim: Optional[int] = None
    temb_layers: int = 1
    temb_activation: str = "silu"

    @nn.compact
    def __call__(self, x, t_embed=None, train: bool = False):
        y = _ComplexConv(self.out_ch, self.kernel_size, self.strides, self.padding,
                         self.dilation, use_bias=self.norm_type is None, name="conv")(x)
        if self.embed_dim is not None and t_embed is not None:
            y = y + _TembLayer(self.embed_dim, self.out_ch, self.temb_layers,
                               self.temb_activation, name="embed_layer")(t_embed)
        y = _get_norm(self.norm_type)(name="norm")(y, train=train)
        return on_reim(get_activation(self.activation), y)


class DCUNetComplexDecoderBlock(nn.Module):
    """Decoder block: complex transposed conv -> (+temb) -> norm -> activation
    (dcunet.py:399-452)."""

    out_ch: int
    kernel_size: tuple
    strides: tuple
    padding: tuple
    dilation: tuple
    output_padding: tuple = (0, 0)
    norm_type: str = "bN"
    activation: str = "leaky_relu"
    embed_dim: Optional[int] = None
    temb_layers: int = 1
    temb_activation: str = "silu"

    @nn.compact
    def __call__(self, x, t_embed=None, output_size=None, train: bool = False):
        y = _ComplexConvTranspose(
            self.out_ch, self.kernel_size, self.strides, self.padding,
            self.output_padding, self.dilation,
            use_bias=self.norm_type is None, name="deconv",
        )(x, output_size=output_size)
        if self.embed_dim is not None and t_embed is not None:
            y = y + _TembLayer(self.embed_dim, self.out_ch, self.temb_layers,
                               self.temb_activation, name="embed_layer")(t_embed)
        y = _get_norm(self.norm_type)(name="norm")(y, train=train)
        return on_reim(get_activation(self.activation), y)


@BackboneRegistry.register("dcunet")
class DCUNet(nn.Module):
    """Complex U-Net score backbone (sgmse/backbones/dcunet.py:165-298)."""

    dcunet_architecture: str = "DilDCUNet-v2"
    dcunet_time_embedding: str = "gfp"
    dcunet_temb_layers_global: int = 2
    dcunet_temb_layers_local: int = 1
    dcunet_temb_activation: str = "silu"
    dcunet_time_embedding_complex: bool = False
    dcunet_fix_length: str = "pad"
    dcunet_mask_bound: str = "none"
    dcunet_norm_type: str = "bN"
    dcunet_activation: str = "relu"
    embed_dim: int = 128

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--dcunet-architecture", type=str, default="DilDCUNet-v2",
                            choices=list(DCUNET_ARCHITECTURES.keys()))
        parser.add_argument("--dcunet-time-embedding", type=str,
                            choices=("gfp", "ds", "none"), default="gfp")
        parser.add_argument("--dcunet-temb-layers-global", type=int, default=1)
        parser.add_argument("--dcunet-temb-layers-local", type=int, default=1)
        parser.add_argument("--dcunet-temb-activation", type=str, default="silu")
        parser.add_argument("--dcunet-time-embedding-complex", action="store_true")
        parser.add_argument("--dcunet-fix-length", type=str, default="pad",
                            choices=("pad", "trim", "none"))
        parser.add_argument("--dcunet-mask-bound", type=str,
                            choices=("tanh", "sigmoid", "none"), default="none")
        parser.add_argument("--dcunet-norm-type", type=str, choices=("bN", "CbN"),
                            default="bN")
        parser.add_argument("--dcunet-activation", type=str,
                            choices=("leaky_relu", "relu", "silu"), default="leaky_relu")
        return parser

    @nn.compact
    def __call__(self, spec: jnp.ndarray, t: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Args:
            spec: complex ``[B, 2, F, T]`` (x_t, y) pair.
            t: ``[B]`` diffusion time.

        Returns:
            complex ``[B, 1, F, T]``.
        """
        if self.dcunet_mask_bound != "none":
            raise NotImplementedError("sorry, mask bounding not implemented at the moment")
        fix_length_mode = self.dcunet_fix_length if self.dcunet_fix_length != "none" else None
        time_embedding = (
            self.dcunet_time_embedding if self.dcunet_time_embedding != "none" else None
        )

        conf_encoders, conf_decoders = DCUNET_ARCHITECTURES[self.dcunet_architecture]
        input_channels = 2  # complex channels (x_t, y), dcunet.py:202
        _unused, *rest = conf_encoders[0]
        encoders_args = ((input_channels, *rest), *conf_encoders[1:])
        decoders_args = conf_decoders
        stride_prod = np.prod([s for _, _, _, s, _, _ in encoders_args], axis=0)

        # NCHW complex -> NHWC complex
        x = jnp.transpose(spec, (0, 2, 3, 1))
        x = self._fix_input_dims(fix_length_mode, x, stride_prod)
        x_in = x

        # --- global time embedding (dcunet.py:223-242, 276) ---
        t_embed = None
        if time_embedding is not None:
            tc = t.astype(jnp.complex64)
            if time_embedding == "gfp":
                t_embed = GaussianFourierProjection(
                    embed_dim=self.embed_dim,
                    complex_valued=self.dcunet_time_embedding_complex,
                    name="gfp",
                )(tc)
            elif time_embedding == "ds":
                t_embed = DiffusionStepEmbedding(
                    embed_dim=self.embed_dim,
                    complex_valued=self.dcunet_time_embedding_complex,
                    name="ds",
                )(tc)
            act = get_activation(self.dcunet_temb_activation)
            for i in range(self.dcunet_temb_layers_global):
                t_embed = ComplexLinear(self.embed_dim, complex_valued=True,
                                        name=f"embed_global_{i}")(t_embed)
                t_embed = on_reim(act, t_embed)

        common = dict(
            norm_type=self.dcunet_norm_type,
            activation=self.dcunet_activation,
            temb_layers=self.dcunet_temb_layers_local,
            temb_activation=self.dcunet_temb_activation,
            embed_dim=self.embed_dim if time_embedding is not None else None,
        )

        # --- encoder / decoder stacks (dcunet.py:278-290) ---
        enc_outs = []
        h = x
        for i, (_in_ch, out_ch, k, s, p, d) in enumerate(encoders_args):
            h = DCUNetComplexEncoderBlock(
                out_ch=out_ch, kernel_size=k, strides=s, padding=p, dilation=d,
                name=f"encoder_{i}", **common,
            )(h, t_embed, train=train)
            enc_outs.append(h)

        for i, (enc_out, dec_args) in enumerate(
            zip(reversed(enc_outs[:-1]), decoders_args[:-1])
        ):
            _in_ch, out_ch, k, s, p, d = dec_args[:6]
            h = DCUNetComplexDecoderBlock(
                out_ch=out_ch, kernel_size=k, strides=s, padding=p, dilation=d,
                name=f"decoder_{i}", **common,
            )(h, t_embed, output_size=enc_out.shape[1:3], train=train)
            h = jnp.concatenate([h, enc_out], axis=-1)

        # output layer: plain ComplexConvTranspose2d, no norm/act (dcunet.py:245)
        _in_ch, out_ch, k, s, p, d = decoders_args[-1][:6]
        out = _ComplexConvTranspose(
            features=out_ch, kernel_size=k, strides=s, padding=p, dilation=d,
            use_bias=True, name="output_layer",
        )(h, output_size=x_in.shape[1:3])

        out = self._fix_output_dims(out, jnp.transpose(spec, (0, 2, 3, 1)))
        return jnp.transpose(out, (0, 3, 1, 2))  # -> [B, 1, F, T]

    @staticmethod
    def _fix_input_dims(fix_length_mode, x, stride_prod):
        """Pad/trim time so (T-1) divides the time-stride product
        (dcunet.py:301-326). NHWC."""
        freq_prod = int(stride_prod[0])
        time_prod = int(stride_prod[1])
        if (x.shape[1] - 1) % freq_prod:
            raise TypeError(
                f"Input shape must be [batch, freq + 1, time + 1, ch] with freq "
                f"divisible by {freq_prod}, got {x.shape} instead"
            )
        time_remainder = (x.shape[2] - 1) % time_prod
        if time_remainder:
            if fix_length_mode is None:
                raise TypeError(
                    f"Input time dim must satisfy (T - 1) %% {time_prod} == 0, got "
                    f"{x.shape}. Set fix_length to 'pad' or 'trim'."
                )
            elif fix_length_mode == "pad":
                x = jnp.pad(x, ((0, 0), (0, 0), (0, time_prod - time_remainder), (0, 0)))
            elif fix_length_mode == "trim":
                x = x[:, :, : x.shape[2] - time_remainder, :]
            else:
                raise ValueError(f"Unknown fix_length mode '{fix_length_mode}'")
        return x

    @staticmethod
    def _fix_output_dims(out, x):
        """Pad/crop output time back to the input's (dcunet.py:329-333). NHWC."""
        inp_len = x.shape[2]
        out_len = out.shape[2]
        if out_len >= inp_len:
            return out[:, :, :inp_len, :]
        return jnp.pad(out, ((0, 0), (0, 0), (0, inp_len - out_len), (0, 0)))
