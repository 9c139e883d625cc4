"""Model registry; ``ref()`` / ``materialization_context`` re-exported
from models.base (dbt-style reference resolution for pipeline runs)."""

from .base import materialization_context, ref
from . import marts_analytics, marts_core, marts_segmentation, raw_layer, staging

__all__ = [
    "raw_layer",
    "staging",
    "marts_core",
    "marts_analytics",
    "marts_segmentation",
    "ref",
    "materialization_context",
]
