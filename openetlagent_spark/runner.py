"""Flow executor: compile a ``PipelineFlow`` into ONE lazy DataFrame.

The reference interprets its op list eagerly, materializing a full
DataFrame after every op (app/main.py:397-429).  The key architectural
inversion here (SURVEY §7.1): fold the whole op list over a lazy
DataFrame — Catalyst then collapses adjacent projections, prunes
columns through joins, and pushes filters into the scans.  Identical
semantics, one optimized distributed plan, no intermediate
materialization.

Also implements the engine-level conventions:
- temp-column drop: an ``assignation`` op whose output column is named
  ``_x_`` (leading AND trailing underscore) is dropped after all ops
  run (reference drops assignation outputs only: app/main.py:413-416);
- save-time schema-ordered projection + validation (via sources/io.py
  and validate.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .model import (
    AsofJoinOperation,
    SqlTransformOperation,
    MergeOperation,
    AssignationOperation,
    AnnStoreAppendOperation,
    AnnStoreBuildOperation,
    AnnStoreQueryOperation,
    BindOperation,
    FileDefinition,
    BloomGateOperation,
    CmsCountsOperation,
    ContaminationOperation,
    IncrementalDedupOperation,
    StoreGateOperation,
    Operation,
    PipelineConfig,
    PipelineFlow,
    RangeJoinOperation,
    SimilarityOperation,
    SnapshotDiffOperation,
    FkCheckOperation,
    UnionOperation,
)
from .operators import (
    OPERATION_DISPATCHER,
    apply_sql_transform,
    apply_ann_store_append,
    apply_ann_store_build,
    apply_ann_store_query,
    apply_asof_join,
    apply_bind,
    apply_bloom_gate,
    apply_cms_counts,
    apply_contamination,
    apply_incremental_dedup,
    apply_store_gate,
    apply_merge,
    apply_range_join,
    apply_snapshot_diff,
    apply_fk_check,
    apply_similarity,
    apply_union,
)
from .sources import save_data, scan_data
from .validate import validate_schema

_TEMP_COLUMN = re.compile(r"^_.+_$")

# Operation types apply_operations special-cases OUTSIDE
# OPERATION_DISPATCHER (they need spark + named inputs).  The single
# source of truth for "runner supports this op" is
# OPERATION_DISPATCHER | RUNNER_HANDLED_OPS — the generator's step
# whitelist imports this instead of duplicating the list, and
# tests/test_flow_roundtrip.py asserts every OPERATION_TYPES entry is
# covered by one of the two.  MUST match the isinstance chain below.
RUNNER_HANDLED_OPS = frozenset({
    "bind", "union", "asof_join", "range_join", "similarity",
    "contamination", "incremental_dedup", "merge", "store_gate",
    "ann_store_build", "ann_store_append", "ann_store_query",
    "snapshot_diff", "fk_check",
    "bloom_gate", "cms_counts", "sql_transform",
})


def apply_operations(
    df: DataFrame,
    operations: list[Operation],
    spark: SparkSession,
    inputs: dict[str, FileDefinition] | None = None,
    *,
    drop_temp_columns: bool = True,
) -> DataFrame:
    """Fold the op list over the lazy DataFrame (reference loop:
    app/main.py:397-429 — ours builds one plan instead of executing
    per-op).

    ``drop_temp_columns=False`` keeps ``_x_`` temp columns alive —
    required when a caller applies ops one at a time (the generator's
    trial loop): temps must survive across calls and only drop after the
    FULL flow, matching the reference's end-of-pipeline drop
    (app/main.py:413-427)."""
    current = df
    temp_columns: list[str] = []
    for op in operations:
        if isinstance(op, BindOperation):
            current = apply_bind(current, op, spark, inputs)
        elif isinstance(op, AsofJoinOperation):
            current = apply_asof_join(current, op, spark, inputs)
        elif isinstance(op, RangeJoinOperation):
            current = apply_range_join(current, op, spark, inputs)
        elif isinstance(op, SimilarityOperation):
            current = apply_similarity(current, op, spark, inputs)
        elif isinstance(op, ContaminationOperation):
            current = apply_contamination(current, op, spark, inputs)
        elif isinstance(op, BloomGateOperation):
            current = apply_bloom_gate(current, op, spark, inputs)
        elif isinstance(op, CmsCountsOperation):
            current = apply_cms_counts(current, op, spark, inputs)
        elif isinstance(op, MergeOperation):
            current = apply_merge(current, op, spark, inputs)
        elif isinstance(op, SnapshotDiffOperation):
            current = apply_snapshot_diff(current, op, spark, inputs)
        elif isinstance(op, FkCheckOperation):
            current = apply_fk_check(current, op, spark, inputs)
        elif isinstance(op, IncrementalDedupOperation):
            current = apply_incremental_dedup(current, op, spark, inputs)
        elif isinstance(op, StoreGateOperation):
            current = apply_store_gate(current, op, spark)
        elif isinstance(op, AnnStoreBuildOperation):
            current = apply_ann_store_build(current, op, spark)
        elif isinstance(op, AnnStoreAppendOperation):
            current = apply_ann_store_append(current, op, spark)
        elif isinstance(op, AnnStoreQueryOperation):
            current = apply_ann_store_query(current, op, spark)
        elif isinstance(op, SqlTransformOperation):
            current = apply_sql_transform(current, op, spark, inputs)
        elif isinstance(op, UnionOperation):
            if not inputs or op.right_input not in inputs:
                raise ValueError(
                    f"union: right input '{op.right_input}' not found in pipeline inputs "
                    f"{sorted(inputs) if inputs else []}"
                )
            current = apply_union(current, op, scan_data(spark, inputs[op.right_input]))
        else:
            fn = OPERATION_DISPATCHER.get(op.operation_type)
            if fn is None:
                raise ValueError(f"Unknown operation type: {op.operation_type!r}")
            current = fn(current, op)
        # Only ASSIGNATION outputs participate in the temp-column sweep —
        # the reference drops exactly those (app/main.py:413-416); a
        # casting/equality output that happens to be named `_x_` survives.
        out = getattr(op, "output_column", None)
        if isinstance(op, AssignationOperation) and out and _TEMP_COLUMN.match(out):
            temp_columns.append(out)

    if not drop_temp_columns:
        return current
    drops = [c for c in temp_columns if c in current.columns]
    return current.drop(*drops) if drops else current


def drop_temp_columns(df: DataFrame) -> DataFrame:
    """Drop all ``_x_``-named columns (the end-of-flow temp sweep for
    callers that built the chain incrementally)."""
    drops = [c for c in df.columns if _TEMP_COLUMN.match(c)]
    return df.drop(*drops) if drops else df


def run_flow(
    spark: SparkSession,
    config: PipelineConfig,
    flow: PipelineFlow,
    output_key: str,
    *,
    save: bool = True,
    single_file: bool = False,
) -> tuple[DataFrame, bool, list[str]]:
    """Execute one flow against one declared output: scan → ops →
    validate → (optionally) save.  Returns (result_df, ok, feedback) —
    the reference's success/feedback contract (app/main.py:571-588)."""
    if flow.source not in config.inputs:
        raise ValueError(
            f"flow source '{flow.source}' not in config inputs {sorted(config.inputs)}"
        )
    out_def = config.outputs[output_key]
    df = scan_data(spark, config.inputs[flow.source])
    result = apply_operations(df, flow.operations, spark, config.inputs)
    ok, feedback = validate_schema(result, out_def)
    if save and ok:
        save_data(result, out_def, single_file=single_file)
    return result, ok, feedback


def probe(df: DataFrame, n: int = 3) -> tuple[dict[str, str], list[dict]]:
    """The cheap trial-probe hook an external LLM generator consumes
    (reference: live schema + head(3) sample at app/main.py:137,144):
    schema from metadata (free), sample via limit(n) (tiny job)."""
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    sample = [r.asDict(recursive=True) for r in df.limit(n).collect()]
    return schema, sample
