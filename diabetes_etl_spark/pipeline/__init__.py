from .registry import Expectation, Pipeline, PipelineRunner

__all__ = ["Expectation", "Pipeline", "PipelineRunner"]
