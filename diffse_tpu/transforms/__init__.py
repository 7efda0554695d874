from .stft import hann_window, sqrthann_window, get_window, stft, istft, StftConfig
from .spec import (
    spec_fwd,
    spec_back,
    pad_spec,
    pad_spec_16,
    width_bucket,
    SpecTransformConfig,
)

__all__ = [
    "hann_window",
    "sqrthann_window",
    "get_window",
    "stft",
    "istft",
    "StftConfig",
    "spec_fwd",
    "spec_back",
    "pad_spec",
    "pad_spec_16",
    "width_bucket",
    "SpecTransformConfig",
]
