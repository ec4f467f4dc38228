"""Query plans: the engine's public query surface.

``registry`` holds every implemented query/operator; ``analytics`` (DataFrame
API) and ``elt`` (pure spark.sql) populate it. ``__spark_entry__`` at the
repo root exposes the registry to the driver's correctness gate.
"""

from . import (  # noqa: F401  (import for registration side effects)
    analytics,
    elt,
    extensions,
    star,
    transform_queries,
)
from .registry import REGISTRY, register

__all__ = ["REGISTRY", "register"]
