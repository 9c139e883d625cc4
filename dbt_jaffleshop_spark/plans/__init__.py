from .dag import MODELS, ModelSpec, build, run_pipeline, topological_order

__all__ = ["MODELS", "ModelSpec", "build", "run_pipeline", "topological_order"]
