"""Production serving: dynamic request batching over the packed fleet engine
plus an HTTP front end (beyond-reference; the reference's only inference
surface is the eval.py file loop)."""

from .service import (EnhanceService, FlightTimeout, RequestTooLarge,  # noqa: F401
                      ServiceConfig, ServiceOverloaded)
from .export import load_artifact, save_artifact  # noqa: F401
