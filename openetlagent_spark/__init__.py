"""openetlagent_spark — a PySpark-native analytics/ETL engine with the
capability surface of Antix5/OpenETLAgent (reference at /root/reference,
studied in SURVEY.md), re-designed Spark-first: lazy DataFrame plans,
Catalyst optimization, distributed execution, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns)."""

from .generator import generate_pipeline_step_by_step
from .model import (
    PipelineConfig,
    PipelineFlow,
    load_pipeline_config,
    load_pipeline_flow,
    parse_operation,
    save_pipeline_flow,
)
from .runner import apply_operations, probe, run_flow
from .session import get_spark
from .validate import validate_schema

__all__ = [
    "PipelineConfig",
    "PipelineFlow",
    "apply_operations",
    "generate_pipeline_step_by_step",
    "get_spark",
    "load_pipeline_config",
    "load_pipeline_flow",
    "parse_operation",
    "probe",
    "run_flow",
    "save_pipeline_flow",
    "validate_schema",
]

__version__ = "0.1.0"
