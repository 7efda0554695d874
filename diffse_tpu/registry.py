"""Generic name -> class registry.

Functional twin of the reference registry (sgmse/util/registry.py:5-34): four
instances exist across the framework (SDERegistry, BackboneRegistry,
PredictorRegistry, CorrectorRegistry) so that CLIs can select classes by string.
"""

from __future__ import annotations

from typing import Callable, Dict, Type


class Registry:
    def __init__(self, managed_thing: str):
        """Create a new registry.

        Args:
            managed_thing: A string describing what is managed by this registry,
                e.g. "Backbone" or "SDE". Used for error messages.
        """
        self.managed_thing = managed_thing
        self._registry: Dict[str, Type] = {}

    def register(self, name: str) -> Callable:
        def inner_wrapper(wrapped_class) -> Callable:
            if name in self._registry:
                raise ValueError(f"{self.managed_thing} with name '{name}' already registered!")
            self._registry[name] = wrapped_class
            return wrapped_class

        return inner_wrapper

    def get_by_name(self, name: str):
        """Get a managed class from the registry by its name."""
        if name in self._registry:
            return self._registry[name]
        raise ValueError(
            f"{self.managed_thing} with name '{name}' unknown! "
            f"Available: {sorted(self._registry)}"
        )

    def get_all_names(self):
        """Get the list of things' names registered to this registry."""
        return list(self._registry.keys())
