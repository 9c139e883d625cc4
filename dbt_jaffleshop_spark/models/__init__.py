from . import marts_analytics, marts_core, marts_segmentation, raw_layer, staging

__all__ = [
    "raw_layer",
    "staging",
    "marts_core",
    "marts_analytics",
    "marts_segmentation",
]
