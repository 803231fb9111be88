from .pipeline_def import build_diabetes_pipeline
from .schema import DIABETES_SCHEMA

__all__ = ["build_diabetes_pipeline", "DIABETES_SCHEMA"]
