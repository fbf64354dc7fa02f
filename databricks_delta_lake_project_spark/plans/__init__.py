from .pipeline import Pipeline, PipelineResult, table

__all__ = ["Pipeline", "PipelineResult", "table"]
