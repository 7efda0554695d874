from .expi import expi
from .upfirdn2d import upfirdn2d, upfirdn2d_numpy
from .fir import (
    setup_fir_kernel,
    upsample_2d,
    downsample_2d,
    upsample_conv_2d,
    conv_downsample_2d,
    naive_upsample_2d,
    naive_downsample_2d,
)
from .fused_act import fused_bias_leaky_relu

__all__ = [
    "expi",
    "upfirdn2d",
    "upfirdn2d_numpy",
    "setup_fir_kernel",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
    "fused_bias_leaky_relu",
]
