"""NCSN++ score network as a flax.linen module (NHWC, TPU-native).

Re-design of the reference's NCSN++ (sgmse/backbones/ncsnpp.py:36-404): a
7-resolution U-Net (nf=128, ch_mult=(1,1,2,2,2,2,2)) over [B, F=256, T, 4]
real feature maps built from the complex (x, y) spectrogram pair, with
BigGAN-style residual blocks, FIR [1,3,3,1] resampling, dense spatial
self-attention at resolution 16, Gaussian-Fourier time embedding, an
input_skip input pyramid and an output_skip output pyramid, and a final
1/sigma output scaling + 1x1 conv back to a complex spectrogram. ~65M params.

Instead of the reference's flat ModuleList + manual index walking
(ncsnpp.py:99-245 / 247-404), the structure here is expressed directly in
``nn.compact`` — flax names submodules deterministically in call order.

The SNR-conditioned variant (sgmse/backbones/ncsnpp_snr.py:36-431) is the same
network with a second Gaussian-Fourier embedding of the noise level fed into
every residual block and a final division by the noise level instead of the
time; both are generated from one generic module here.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from . import layers
from .shared import BackboneRegistry

conv1x1 = layers.conv1x1
conv3x3 = layers.conv3x3

# nn.remat-wrapped resblock classes, cached so every block shares one lifted
# class. static_argnums counts the module itself as argument 0, so `train`
# (x, temb, semb, train, [x2]) is position 4; x2 stays traced (it is a real
# feature map on the up path).
_REMAT_CACHE: dict = {}


def _maybe_remat(cls, remat: bool):
    if not remat:
        return cls
    wrapped = _REMAT_CACHE.get(cls)
    if wrapped is None:
        wrapped = nn.remat(cls, static_argnums=(4,))
        _REMAT_CACHE[cls] = wrapped
    return wrapped


class NCSNppBase(nn.Module):
    """Generic NCSN++ with optional dual (time, noise) conditioning."""

    scale_by_sigma: bool = True
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    embedding_type: str = "fourier"
    dropout: float = 0.0
    snr_conditioning: bool = False  # True -> NCSNpp_snr behavior
    # Compute dtype for the full trunk (e.g. "bf16"): convs/dense run on the
    # MXU in half precision AND activations cross HBM in half precision
    # (GroupNorm statistics and attention internals stay f32; the output
    # pyramid and final convs stay f32). None = float32 everywhere.
    dtype: Optional[str] = None
    # Fuse each resblock's GroupNorm+SiLU pair into the Pallas kernel
    # (ops/pallas_kernels.py). Only takes effect for the swish nonlinearity;
    # param tree is unchanged. Default off: measured SLOWER than XLA on the
    # full model (the hand conv schedule loses to the XLA conv emitter,
    # DEVNOTES.md round 2).
    use_pallas_groupnorm: bool = False
    # Fuse the output-pyramid GroupNorm+SiLU+conv3x3(->4ch) heads into the
    # Pallas kernel (skips materializing the full-width activated map; the
    # 4-channel conv is too small for the emitter advantage to matter).
    # Bit-exact vs the XLA chain; transparently falls back to the jnp
    # reference off-TPU or on unsupported shapes. Param names match the
    # unfused path exactly.
    fuse_pyramid: bool = False
    # Lower stride-1 3x3 resblock convs whose spatial map has at most this
    # many positions to a single im2col matmul (layers.MatmulConv) instead of
    # lax.conv — the deep U-Net levels (e.g. 4x1 at T=64) are too small for
    # the conv emitter's tiling. 0 = always use lax.conv. Param tree is
    # unchanged either way.
    matmul_conv_max_hw: int = 0
    # Run the fused Pallas GroupNorm+SiLU+conv3x3 resblock chain ONLY at
    # levels whose feature map has at most this many spatial positions
    # (0 = off). Unlike `use_pallas_groupnorm` (all levels — measured slower
    # than XLA on the full model), this targets just the deep levels
    # (4x1 / 8x2 at T=64) where the conv emitter's schedule is weakest and
    # custom-call relayout copies are cheapest. Param tree unchanged.
    pallas_max_hw: int = 0
    # jax.checkpoint (nn.remat) every residual block: the backward pass
    # recomputes block activations instead of storing them, cutting training
    # activation HBM from O(depth) feature maps to O(1) per level at ~1/3
    # extra FLOPs — the TPU lever for larger nf/ch_mult/batch than HBM
    # otherwise allows. Param tree and forward values are bit-identical to
    # remat=False; gradients agree to float tolerance (the recomputed
    # backward may reassociate reductions) — tests/test_backbones.py.
    remat: bool = False

    @property
    def _compute_dtype(self):
        if self.dtype in (None, "float32", "f32"):
            return None
        if self.dtype in ("bfloat16", "bf16"):
            return jnp.bfloat16
        return self.dtype

    def _resnet_block(self, act, out_ch=None, up=False, down=False, name=None):
        if self.resblock_type == "ddpm":
            cls = _maybe_remat(layers.ResnetBlockDDPMpp, self.remat)
            return cls(
                act=act, out_ch=out_ch, dropout=self.dropout,
                init_scale=self.init_scale, skip_rescale=self.skip_rescale,
                name=name,
            )
        elif self.resblock_type == "biggan":
            cls = _maybe_remat(layers.ResnetBlockBigGANpp, self.remat)
            return cls(
                act=act, out_ch=out_ch, up=up, down=down, dropout=self.dropout,
                fir=self.fir, fir_kernel=self.fir_kernel,
                init_scale=self.init_scale, skip_rescale=self.skip_rescale,
                dtype=self._compute_dtype,
                pallas_gn_silu=(self.use_pallas_groupnorm
                                and self.nonlinearity == "swish"),
                pallas_max_hw=(self.pallas_max_hw
                               if self.nonlinearity == "swish" else 0),
                matmul_conv_max_hw=self.matmul_conv_max_hw,
                name=name,
            )
        raise ValueError(f"resblock type {self.resblock_type} unrecognized.")

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_cond: jnp.ndarray,
        noise_cond: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Args:
            x: complex ``[B, 2, F, T]`` — channel 0 is the diffusion state,
               channel 1 the conditioning spectrogram (ncsnpp.py:252-254).
            time_cond: ``[B]`` diffusion time / noise level.
            noise_cond: ``[B]`` extra SNR/noise conditioning (snr variant only).

        Returns:
            complex score ``[B, 1, F, T]``.
        """
        act = layers.get_act(self.nonlinearity)
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_resolutions = [self.image_size // (2**i) for i in range(num_resolutions)]
        combine_method = self.progressive_combine.lower()
        assert self.progressive in ["none", "output_skip", "residual"]
        assert self.progressive_input in ["none", "input_skip", "residual"]

        # Complex (x, y) pair -> 4 real channels, NCHW -> NHWC.
        h = jnp.stack(
            [x[:, 0].real, x[:, 0].imag, x[:, 1].real, x[:, 1].imag], axis=-1
        )  # [B, F, T, 4]
        num_channels = 4

        # --- timestep / noise embeddings -------------------------------------
        if self.embedding_type == "fourier":
            used_sigmas = noise_cond if self.snr_conditioning else time_cond
            temb = layers.GaussianFourierProjection(
                embedding_size=nf, scale=self.fourier_scale, name="time_embed"
            )(jnp.log(time_cond))
            if self.snr_conditioning:
                semb = layers.GaussianFourierProjection(
                    embedding_size=nf, scale=self.fourier_scale, name="noise_embed"
                )(jnp.log(noise_cond))
        elif self.embedding_type == "positional":
            # NOTE: the reference's positional path indexes an undefined
            # ``self.sigmas`` (ncsnpp.py:265, dead path); here used_sigmas
            # falls back to the conditioning value itself.
            used_sigmas = noise_cond if self.snr_conditioning else time_cond
            temb = layers.get_timestep_embedding(time_cond, nf)
            if self.snr_conditioning:
                semb = layers.get_timestep_embedding(noise_cond, nf)
        else:
            raise ValueError(f"embedding type {self.embedding_type} unknown.")

        if self.conditional:
            temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                            bias_init=nn.initializers.zeros, name="temb_dense_0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                            bias_init=nn.initializers.zeros, name="temb_dense_1")(act(temb))
            if self.snr_conditioning:
                semb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                                bias_init=nn.initializers.zeros, name="semb_dense_0")(semb)
                semb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                                bias_init=nn.initializers.zeros, name="semb_dense_1")(act(semb))
        else:
            temb = None
            semb = None
        if not self.snr_conditioning:
            semb = None

        # With remat on, the lifted class's auto-name would become
        # "Checkpoint<Name>_k" — assign explicit names reproducing flax's
        # call-order numbering so the param tree is identical either way.
        _block_counter = {}

        def _block_name(base: str):
            if not self.remat:
                return None
            k = _block_counter.get(base, 0)
            _block_counter[base] = k + 1
            return f"{base}_{k}"

        def resblock(h_in, temb_, semb_, out_ch=None, up=False, down=False,
                     x2=None):
            if self.resblock_type == "biggan":
                block = self._resnet_block(
                    act, out_ch=out_ch, up=up, down=down,
                    name=_block_name("ResnetBlockBigGANpp"))
                # x2 is the up-path skip tensor: the BigGAN block consumes it
                # as a virtual concat without materializing the concat buffer
                # (models/layers.py::_call_split) — exact math, less HBM.
                # (train/x2 passed positionally: nn.remat static_argnums is
                # positional, see _maybe_remat.)
                return block(h_in, temb_, semb_, train, x2)
            block = self._resnet_block(act, out_ch=out_ch, up=up, down=down,
                                       name=_block_name("ResnetBlockDDPMpp"))
            if x2 is not None:
                h_in = jnp.concatenate([h_in, x2], axis=-1)
            return block(h_in, temb_, semb_, train)

        # --- down path --------------------------------------------------------
        input_pyramid = None
        if self.progressive_input != "none":
            input_pyramid = h

        hs = [conv3x3(nf, dtype=self._compute_dtype)(h)]
        in_ch = nf
        for i_level in range(num_resolutions):
            for _i_block in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                h = resblock(hs[-1], temb, semb, out_ch=out_ch)
                in_ch = out_ch
                if all_resolutions[i_level] in self.attn_resolutions:
                    h = layers.AttnBlockpp(
                        skip_rescale=self.skip_rescale, init_scale=self.init_scale
                    )(h)
                hs.append(h)

            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = layers.Downsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=self.fir_kernel,
                    )(hs[-1])
                else:
                    h = resblock(hs[-1], temb, semb, down=True)

                if self.progressive_input == "input_skip":
                    input_pyramid = layers.Downsample(
                        fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
                    )(input_pyramid)
                    h = layers.Combine(dim2=h.shape[-1], method=combine_method,
                                       dtype=self._compute_dtype)(
                        input_pyramid, h
                    )
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    input_pyramid = layers.Downsample(
                        out_ch=in_ch, fir=self.fir, fir_kernel=self.fir_kernel,
                        with_conv=True,
                    )(input_pyramid)
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / math.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- bottleneck ---------------------------------------------------------
        h = hs[-1]
        h = resblock(h, temb, semb)
        h = layers.AttnBlockpp(skip_rescale=self.skip_rescale, init_scale=self.init_scale)(h)
        h = resblock(h, temb, semb)

        # --- up path --------------------------------------------------------------
        # Pyramid heads get explicit module names equal to what flax's
        # auto-naming assigned historically (GroupNorm_k / Conv_{k+1}; the
        # stem conv is Conv_0) so the param tree is stable across the fused
        # and unfused paths and the torch converter's mapping is unchanged.
        pyr_counter = [0]

        def pyramid_head(h_in):
            k = pyr_counter[0]
            pyr_counter[0] += 1
            ch = h_in.shape[-1]
            cdt_ = self._compute_dtype
            gn_name, conv_name = f"GroupNorm_{k}", f"Conv_{k + 1}"
            if self.fuse_pyramid and self.nonlinearity == "swish":
                from ..ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

                gs, gb = layers._GNParams(ch, name=gn_name)()
                w, bcv = layers._ConvParams(
                    3, ch, num_channels, init_scale=self.init_scale,
                    name=conv_name)()
                bt = jnp.broadcast_to(
                    bcv.astype(jnp.float32)[None, :],
                    (h_in.shape[0], num_channels))
                out = groupnorm_silu_conv3x3_pallas(
                    h_in, gs, gb, w, bt, num_groups=min(ch // 4, 32),
                    compute_dtype=cdt_)
                return out.astype(jnp.float32)
            p = act(layers.group_norm(ch, dtype=cdt_, name=gn_name)(h_in))
            return conv3x3(num_channels, init_scale=self.init_scale,
                           dtype=cdt_, name=conv_name)(p).astype(jnp.float32)

        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for _i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                h = resblock(h, temb, semb, out_ch=out_ch, x2=hs.pop())
                in_ch = out_ch

            if all_resolutions[i_level] in self.attn_resolutions:
                h = layers.AttnBlockpp(
                    skip_rescale=self.skip_rescale, init_scale=self.init_scale
                )(h)

            if self.progressive != "none":
                # The per-level pyramid GN+conv reads the full-width feature
                # map: run it in the compute dtype, accumulating the (cheap,
                # 4-channel) pyramid itself in f32.
                cdt = self._compute_dtype
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        pyramid = pyramid_head(h)
                    elif self.progressive == "residual":
                        pyramid = act(layers.group_norm(h.shape[-1], dtype=cdt)(h))
                        pyramid = conv3x3(in_ch, dtype=cdt)(pyramid).astype(jnp.float32)
                else:
                    if self.progressive == "output_skip":
                        pyramid = layers.Upsample(
                            fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
                        )(pyramid)
                        pyramid_h = pyramid_head(h)
                        pyramid = pyramid + pyramid_h
                    elif self.progressive == "residual":
                        pyramid = layers.Upsample(
                            out_ch=in_ch, fir=self.fir, fir_kernel=self.fir_kernel,
                            with_conv=True,
                        )(pyramid)
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / math.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = layers.Upsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=self.fir_kernel,
                    )(h)
                else:
                    h = resblock(h, temb, semb, up=True)

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = act(layers.group_norm(h.shape[-1])(h))
            h = conv3x3(num_channels, init_scale=self.init_scale)(h)

        # 1/sigma output scaling (applied unconditionally in the reference,
        # ncsnpp.py:398 / ncsnpp_snr.py:425).
        h = h / used_sigmas[:, None, None, None]

        # 4 -> 2 real channels -> complex [B, 1, F, T] (ncsnpp.py:96-97,400-404)
        h = nn.Conv(2, (1, 1), name="output_layer")(h)
        out = (h[..., 0] + 1j * h[..., 1])[:, None, :, :]
        return out


def _add_size_args(parser):
    """Optional size overrides (the reference's add_argparse_args is empty,
    ncsnpp.py:40-43; these extras enable small smoke configurations)."""
    parser.add_argument("--nf", type=int, default=None)
    parser.add_argument("--ch_mult", type=int, nargs="+", default=None)
    parser.add_argument("--num_res_blocks", type=int, default=None)
    parser.add_argument("--attn_resolutions", type=int, nargs="+", default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--backbone_dtype", dest="dtype", type=str, default=None,
                        choices=("float32", "bf16"))
    parser.add_argument("--pallas_groupnorm", dest="use_pallas_groupnorm",
                        action="store_true", default=False)
    parser.add_argument("--pallas_max_hw", type=int, default=0,
                        help="fused Pallas resblock chain at levels with "
                             "<= this many spatial positions (16 = two "
                             "deepest at T=64; 0 = off)")
    parser.add_argument("--fuse_pyramid", dest="fuse_pyramid",
                        action="store_true", default=False)
    parser.add_argument("--remat", dest="remat", action="store_true",
                        default=False,
                        help="jax.checkpoint every resblock (recompute "
                             "activations in backward; larger models/batches "
                             "per chip at ~1/3 extra FLOPs)")
    return parser


@BackboneRegistry.register("ncsnpp")
class NCSNpp(NCSNppBase):
    """NCSN++ (sgmse/backbones/ncsnpp.py:36). Call: (x, t) -> score."""

    snr_conditioning: bool = False

    @staticmethod
    def add_argparse_args(parser):
        return _add_size_args(parser)


@BackboneRegistry.register("ncsnpp_snr")
class NCSNppSNR(NCSNppBase):
    """SNR-conditioned NCSN++ (sgmse/backbones/ncsnpp_snr.py:36).
    Call: (x, t, s) -> score; output divided by the noise conditioning."""

    snr_conditioning: bool = True

    @staticmethod
    def add_argparse_args(parser):
        return _add_size_args(parser)
