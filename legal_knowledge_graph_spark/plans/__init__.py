"""Stage composition: the 7-step pipeline as a thin driver over stage
functions (the LangGraph state machine's Spark restatement, SURVEY §3.2)."""

from .pipeline import KGPipeline, PipelineResult, run_pipeline  # noqa: F401
