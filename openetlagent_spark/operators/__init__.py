"""Operator dispatch — the Spark analogue of the reference's
``OPERATION_DISPATCHER`` (app/main.py:67-79), covering the 11 parity
operators plus the engine's extension operators."""

from __future__ import annotations

from .advanced import (
    apply_asof_join,
    apply_chunk,
    apply_contamination,
    apply_dedup,
    apply_merge,
    apply_mixture,
    apply_pack_sequences,
    apply_range_join,
    apply_repetition,
    apply_scd2,
    apply_scrub,
    apply_similarity,
    apply_stratified_sample,
)
from .application import apply_application, compile_lambda
from .bind import apply_bind
from .core import (
    apply_arithmetic,
    apply_assignation,
    apply_casting,
    apply_comparison,
    apply_concatenation,
    apply_equality,
    apply_switching,
)
from .extensions import (
    apply_aggregation,
    apply_distinct,
    apply_filter,
    apply_json_extract,
    apply_limit,
    apply_repartition,
    apply_sample,
    apply_select,
    apply_sort,
    apply_union,
    apply_window,
)
from .reshape import apply_fold, apply_unfold

# Simple (df, op) -> df operators; bind/union/similarity/asof_join/
# range_join need extra context (spark + named inputs) and are
# dispatched specially by the runner.
OPERATION_DISPATCHER = {
    "dedup": apply_dedup,
    "pack_sequences": apply_pack_sequences,
    "scrub": apply_scrub,
    "repetition": apply_repetition,
    "mixture": apply_mixture,
    "scd2": apply_scd2,
    "stratified_sample": apply_stratified_sample,
    "chunk": apply_chunk,
    "equality": apply_equality,
    "concatenation": apply_concatenation,
    "application": apply_application,
    "switching": apply_switching,
    "assignation": apply_assignation,
    "casting": apply_casting,
    "arithmetic": apply_arithmetic,
    "comparison": apply_comparison,
    "fold": apply_fold,
    "unfold": apply_unfold,
    "filter": apply_filter,
    "json_extract": apply_json_extract,
    "aggregation": apply_aggregation,
    "sort": apply_sort,
    "limit": apply_limit,
    "distinct": apply_distinct,
    "window": apply_window,
    "repartition": apply_repartition,
    "sample": apply_sample,
    "select": apply_select,
}

__all__ = [
    "OPERATION_DISPATCHER",
    "apply_aggregation",
    "apply_application",
    "apply_arithmetic",
    "apply_asof_join",
    "apply_assignation",
    "apply_bind",
    "apply_dedup",
    "apply_chunk",
    "apply_merge",
    "apply_mixture",
    "apply_scd2",
    "apply_stratified_sample",
    "apply_casting",
    "apply_comparison",
    "apply_concatenation",
    "apply_distinct",
    "apply_equality",
    "apply_filter",
    "apply_json_extract",
    "apply_fold",
    "apply_limit",
    "apply_range_join",
    "apply_repartition",
    "apply_sample",
    "apply_select",
    "apply_similarity",
    "apply_sort",
    "apply_switching",
    "apply_unfold",
    "apply_union",
    "apply_window",
    "compile_lambda",
]
