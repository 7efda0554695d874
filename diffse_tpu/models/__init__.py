from .shared import BackboneRegistry

# Importing the backbone modules registers them.
from . import ncsnpp  # noqa: F401
from . import ncsnpp_snr  # noqa: F401
from . import snrnet  # noqa: F401
from . import dcunet  # noqa: F401

__all__ = ["BackboneRegistry"]
