from . import marts_core, raw_layer, staging

__all__ = ["raw_layer", "staging", "marts_core"]
