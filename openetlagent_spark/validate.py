"""Post-run schema validation — pure metadata, no Spark job.

Mirrors the reference's ``validate_schema`` (app/main.py:287-334): check
(a) every declared target column exists and (b) its dtype satisfies the
declared logical type; ``positive integer`` accepts any integral type
with no positivity check (app/main.py:318-320).  Extra columns are
allowed (dropped later by the save-time projection).  Returns
``(ok, feedback_messages)`` — the textual feedback is the reference's
LLM self-correction channel (app/main.py:325-331).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .model import FileDefinition
from .types import types_equivalent


def validate_schema(df: DataFrame, fd: FileDefinition) -> tuple[bool, list[str]]:
    feedback: list[str] = []
    actual_types = {f.name: f.dataType for f in df.schema.fields}
    for name, cd in fd.file_schema.columns.items():
        if name not in actual_types:
            feedback.append(
                f"Missing target column '{name}' (expected type {cd.type}). "
                f"Available columns: {list(actual_types)}"
            )
            continue
        if not types_equivalent(actual_types[name], cd.type):
            feedback.append(
                f"Column '{name}' has type {actual_types[name].simpleString()} "
                f"but target schema requires {cd.type}"
            )
    return (not feedback, feedback)
