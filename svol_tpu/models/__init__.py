from svol_tpu.models.model import SketchLocalizationModel, build_model

__all__ = ["SketchLocalizationModel", "build_model"]
