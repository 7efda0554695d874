"""SNR-conditioned NCSN++ backbone.

The implementation lives in ``diffse_tpu/models/ncsnpp.py`` (``NCSNppBase``
with ``snr_conditioning=True``); this module mirrors the reference's file
layout (sgmse/backbones/ncsnpp_snr.py) and re-exports the registered class.
"""

from .ncsnpp import NCSNppSNR

__all__ = ["NCSNppSNR"]
