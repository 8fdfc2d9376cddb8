"""Pipeline IR: operation specs, file definitions, pipeline config/flow.

Mirrors the *capability surface* of the reference's Pydantic model layer
(reference: app/models.py:40-149) as plain dataclasses: eleven operation
types discriminated by ``operation_type``, a file/schema model, and the
flat ``PipelineFlow`` op-list IR.  The engine compiles a flow into ONE
lazy Spark DataFrame chain (see runner.py) instead of eagerly
materializing after every op like the reference (app/main.py:402-412).

Extension operations beyond the reference surface (filter, aggregate,
sort, limit, distinct, union, window) use the same discriminated-spec
shape so flows can mix parity ops and extensions freely.
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field
from typing import Any

import yaml


class SpecError(ValueError):
    """Raised when an operation spec is structurally invalid."""


# ---------------------------------------------------------------------------
# Operation specs (reference: app/models.py:40-137)
# ---------------------------------------------------------------------------


@dataclass
class Operation:
    """Base spec: every op has a type and most produce one output column
    (reference: app/models.py:40-42)."""

    output_column: str | None = None

    operation_type: str = ""


@dataclass
class EqualityOperation(Operation):
    """Copy a column under a new name (reference: app/models.py:46-48)."""

    input_column: str = ""
    operation_type: str = "equality"


@dataclass
class ConcatenationOperation(Operation):
    """Null-propagating string concat with separator
    (reference: app/models.py:50-53; null semantics per concat_str,
    app/operations/concatenation.py:10-13)."""

    input_columns: list[str] = field(default_factory=list)
    separator: str = ""
    operation_type: str = "concatenation"


@dataclass
class ApplicationOperation(Operation):
    """Row-wise sandboxed lambda over named input columns
    (reference: app/models.py:55-58, app/operations/application.py:5-33)."""

    input_columns: list[str] = field(default_factory=list)
    function_str: str = ""
    # Engine extension: declared Spark-side return logical type.  The
    # reference relies on Polars type inference; Spark UDFs need a declared
    # type, so we accept one and fall back to probe-based inference.
    return_type: str | None = None
    operation_type: str = "application"


@dataclass
class SwitchingOperation(Operation):
    """Multi-way CASE copying from mapped *source columns*
    (reference: app/models.py:60-76).  Exactly one of default_column /
    default_value must be set (validator at app/models.py:67-76)."""

    switch_column: str = ""
    mapping: dict[Any, str] = field(default_factory=dict)
    default_column: str | None = None
    default_value: Any = None
    operation_type: str = "switching"

    def __post_init__(self) -> None:
        if (self.default_column is None) == (self.default_value is None):
            raise SpecError(
                "switching requires exactly one of default_column / default_value "
                "(reference validator: app/models.py:67-76)"
            )


@dataclass
class AssignationOperation(Operation):
    """Constant column from a literal (reference: app/models.py:78-80)."""

    value: Any = None
    operation_type: str = "assignation"


@dataclass
class CastingOperation(Operation):
    """Cast one column to one of the logical types
    (reference: app/models.py:82-85)."""

    input_column: str = ""
    target_type: str = "string"
    operation_type: str = "casting"


@dataclass
class ArithmeticOperation(Operation):
    """Binary + - * / between exactly two columns
    (reference: app/models.py:87-90)."""

    input_columns: list[str] = field(default_factory=list)
    operator: str = "+"
    operation_type: str = "arithmetic"

    def __post_init__(self) -> None:
        if len(self.input_columns) != 2:
            raise SpecError(
                f"arithmetic requires exactly two input columns, got "
                f"{self.input_columns} (reference: app/models.py:88)"
            )
        if self.operator not in ("+", "-", "*", "/"):
            raise SpecError(f"arithmetic operator must be one of + - * /, got {self.operator!r}")


@dataclass
class ComparisonOperation(Operation):
    """Compare a column to a literal producing a boolean *column* — a
    projection, NOT a row filter (reference: app/models.py:92-96)."""

    input_column: str = ""
    operator: str = "=="
    value: Any = None
    operation_type: str = "comparison"

    def __post_init__(self) -> None:
        if self.operator not in ("==", "!=", ">", "<", ">=", "<="):
            raise SpecError(f"comparison operator must be one of == != > < >= <=, got {self.operator!r}")


@dataclass
class BindOperation(Operation):
    """Join against an external file or named input
    (reference: app/models.py:98-105, app/operations/bind.py:7-59).
    Right side is projected to {right_on} ∪ columns_to_add before the
    join; colliding right columns are renamed ``{col}_right`` and the
    right key is dropped (Polars semantics, SURVEY §2.3.2)."""

    right_file_path: str = ""
    right_schema_columns: dict[str, str] = field(default_factory=dict)
    left_on: str | list[str] = ""
    right_on: str | list[str] = ""
    how: str = "left"
    columns_to_add: list[str] = field(default_factory=list)
    skew_salt: int = 0
    operation_type: str = "bind"

    def __post_init__(self) -> None:
        if self.how not in ("left", "inner", "outer", "cross", "semi", "anti"):
            raise SpecError(
                f"bind how must be one of left/inner/outer/cross/semi/anti, got {self.how!r} "
                "(reference surface is left/inner/outer/cross, app/models.py:104; "
                "semi/anti are engine extensions — SURVEY §2.2 gap)"
            )
        if len(self.left_keys()) != len(self.right_keys()):
            raise SpecError(
                f"bind left_on/right_on key counts differ: {self.left_on!r} vs {self.right_on!r}"
            )
        # An empty key set on a keyed join would join unconditionally —
        # a silent cartesian product.  Cross joins must be asked for.
        if self.how != "cross" and not [k for k in self.left_keys() if k]:
            raise SpecError(f"bind how={self.how!r} requires join keys (use how='cross' for none)")
        if self.skew_salt < 0:
            raise SpecError(f"bind skew_salt must be >= 0, got {self.skew_salt!r}")
        if self.skew_salt > 1 and self.how not in ("inner", "left"):
            raise SpecError("bind skew_salt applies to inner/left joins only")

    def left_keys(self) -> list[str]:
        """Join keys, single-key string or multi-key list (multi-key is
        an engine extension — the reference joins on one equi-key,
        app/models.py:104)."""
        return [self.left_on] if isinstance(self.left_on, str) else list(self.left_on)

    def right_keys(self) -> list[str]:
        return [self.right_on] if isinstance(self.right_on, str) else list(self.right_on)


@dataclass
class FoldOperation(Operation):
    """Unpivot wide→long (reference: app/models.py:107-112,
    app/operations/fold.py:6-32).  id/value overlap is legal."""

    id_columns: list[str] = field(default_factory=list)
    value_columns: list[str] = field(default_factory=list)
    key_column_name: str = "key"
    value_column_name: str = "value"
    operation_type: str = "fold"


@dataclass
class UnfoldOperation(Operation):
    """Pivot long→wide; duplicate (index, key) resolved by FIRST
    (reference: app/models.py:114-118; hard-coded first at
    app/operations/unfold.py:34).  ``order_column`` is an engine
    extension giving 'first' a deterministic meaning under distributed
    execution (min_by over that column); when absent, a stable row id
    captured at scan time is used."""

    index_columns: list[str] = field(default_factory=list)
    key_column: str = ""
    value_column: str = ""
    order_column: str | None = None
    operation_type: str = "unfold"


# --- Extension operations (beyond the reference surface, SURVEY §2.2) ------


@dataclass
class FilterOperation(Operation):
    """Row filter — absent from the reference (SURVEY §2.2: 'no
    row-filtering operator exists'); added because any real pipeline
    needs one.  Either a boolean ``input_column`` or a (column, operator,
    value) predicate like comparison."""

    input_column: str = ""
    operator: str | None = None
    value: Any = None
    operation_type: str = "filter"


@dataclass
class AggregationOperation(Operation):
    """Group-by aggregation — absent from the reference (SURVEY §2.2).
    aggregations: {output_name: {"column": c, "agg": fn}} with
    fn ∈ sum/min/max/avg/count/count_distinct/first/collect_set/
    percentile (extra key "p", exact interpolated)/approx_count_distinct
    (HLL sketch, extra key "rsd").
    ``grouping``: "groupby" (default) | "rollup" | "cube" |
    "sets" (explicit ``grouping_sets``) for subtotal combinations."""

    group_by: list[str] = field(default_factory=list)
    aggregations: dict[str, dict[str, str]] = field(default_factory=dict)
    grouping: str = "groupby"
    grouping_sets: list[list[str]] = field(default_factory=list)
    operation_type: str = "aggregation"

    def __post_init__(self) -> None:
        if self.grouping not in ("groupby", "rollup", "cube", "sets"):
            raise SpecError(
                f"aggregation grouping must be groupby/rollup/cube/sets, got {self.grouping!r}"
            )
        if self.grouping == "sets" and not self.grouping_sets:
            raise SpecError("aggregation grouping='sets' requires grouping_sets")


@dataclass
class SortOperation(Operation):
    columns: list[str] = field(default_factory=list)
    descending: list[bool] = field(default_factory=list)
    operation_type: str = "sort"


@dataclass
class LimitOperation(Operation):
    n: int = 0
    operation_type: str = "limit"


@dataclass
class DistinctOperation(Operation):
    subset: list[str] = field(default_factory=list)
    operation_type: str = "distinct"


@dataclass
class UnionOperation(Operation):
    """Set operation by name with another named input.  mode ∈
    all (UNION ALL, default) / distinct (UNION) / intersect / except —
    the reference has NO set ops (SURVEY §2.2); intersect/except use
    Spark's DISTINCT set semantics, matching SQL INTERSECT/EXCEPT."""

    right_input: str = ""
    mode: str = "all"
    operation_type: str = "union"

    def __post_init__(self) -> None:
        if self.mode not in ("all", "distinct", "intersect", "except"):
            raise SpecError(
                f"union mode must be all/distinct/intersect/except, got {self.mode!r}"
            )


@dataclass
class JsonExtractOperation(Operation):
    """Extract a scalar from a JSON-string column by JSONPath (e.g.
    ``$.user.id``), optionally cast to a logical type — a scalar-
    function capability the reference lacks entirely (SURVEY §2.2
    'no array/map/json functions').  Malformed JSON or a missing path
    yields NULL (get_json_object semantics)."""

    input_column: str = ""
    json_path: str = "$"
    target_type: str | None = None
    operation_type: str = "json_extract"

    def __post_init__(self) -> None:
        if not self.json_path.startswith("$"):
            raise SpecError(f"json_extract path must start with '$', got {self.json_path!r}")


@dataclass
class SelectOperation(Operation):
    """Mid-pipeline projection: keep exactly ``columns`` in order, or
    drop ``drop_columns`` (exactly one must be given).  The reference
    can only drop columns via the ``_x_`` temp convention at flow end
    (SURVEY §1.4); set ops and sinks need explicit shape control."""

    columns: list[str] = field(default_factory=list)
    drop_columns: list[str] = field(default_factory=list)
    operation_type: str = "select"

    def __post_init__(self) -> None:
        if bool(self.columns) == bool(self.drop_columns):
            raise SpecError("select requires exactly one of columns / drop_columns")


@dataclass
class SampleOperation(Operation):
    """Row sample (without replacement), two modes:

    - default: seeded Bernoulli — reproducible WITHIN Spark, but the
      row subset is partitioning-dependent;
    - ``key_column`` set: deterministic md5-bucket sample of rows whose
      hashed key falls under ``fraction`` (basis-point granularity) —
      stable across engines, cluster layouts, and dataset growth (the
      same hashing contract as functions.text.split_assign), and
      therefore oracle-checkable."""

    fraction: float = 0.1
    seed: int = 42
    key_column: str = ""
    operation_type: str = "sample"

    def __post_init__(self) -> None:
        if not (0.0 < self.fraction <= 1.0):
            raise SpecError(f"sample fraction must be in (0, 1], got {self.fraction!r}")


@dataclass
class RepartitionOperation(Operation):
    """Explicit partitioning control — pre-shuffle on join/agg keys to
    co-locate downstream stages, or rebalance after a skewing filter.
    ``columns`` empty → round-robin rebalance to ``num_partitions``."""

    columns: list[str] = field(default_factory=list)
    num_partitions: int | None = None
    operation_type: str = "repartition"


@dataclass
class WindowOperation(Operation):
    """Window function over partition/order: fn ∈ row_number/rank/
    dense_rank/ntile/percent_rank/cume_dist/lag/lead/first_value/
    last_value/sum/avg/min/max/count.  first/last span the WHOLE
    partition (deterministic given a total order), not the default
    running frame.  For the aggregate functions an optional ``frame`` =
    [start, end] offsets (negative = preceding, e.g. [-2, 0] =
    2 PRECEDING .. CURRENT ROW; ``frame_type`` rows|range) turns the
    running aggregate into a sliding one."""

    function: str = "row_number"
    partition_by: list[str] = field(default_factory=list)
    order_by: list[str] = field(default_factory=list)
    descending: list[bool] = field(default_factory=list)
    value_column: str | None = None
    offset: int = 1
    frame: list[int] = field(default_factory=list)
    frame_type: str = "rows"
    operation_type: str = "window"

    def __post_init__(self) -> None:
        if self.frame and len(self.frame) != 2:
            raise SpecError(f"window frame must be [start, end] offsets, got {self.frame!r}")
        if self.frame and self.frame[0] > self.frame[1]:
            raise SpecError(f"window frame start must be <= end, got {self.frame!r}")
        if self.frame and self.function not in ("sum", "avg", "min", "max", "count"):
            raise SpecError(
                f"window frame applies to aggregate functions only, not {self.function!r}"
            )
        if self.frame_type not in ("rows", "range"):
            raise SpecError(f"window frame_type must be rows/range, got {self.frame_type!r}")
        if self.frame_type == "range" and len(self.order_by) != 1:
            raise SpecError("window range frames require exactly one (numeric) order_by column")


# --- North-star operations as flow ops (SURVEY §2 extension surface) -------
# These make the training-data operators reachable from a GENERATED
# pipeline (the reference's LLM flow path, app/main.py:85-283): an LLM
# emitting YAML can now dispatch dedup / similarity / asof / range joins
# like any parity op.


@dataclass
class DedupOperation(Operation):
    """Deduplication as a flow op (functions/dedup.py strategies).

    strategy ∈ exact / minhash / simhash / ngram / embedding / substring
    (exact shared token runs — partial-duplication signal) / fuzzy
    (blocked Levenshtein prefix pairs — functions/fuzzy.py);
    mode ∈ drop (single-hop: rows with a lower-id near-dup partner
    removed) / pairs (the pair table id_a, id_b, score) / components
    (cluster labels: node, component via distributed connected
    components — functions/graph.py) / cluster_drop (TRANSITIVE dedup:
    exactly one survivor, the minimum id, per duplicate cluster) /
    keep_best (TRANSITIVE dedup keeping each cluster's highest
    ``score_column`` row, min id on ties — functions/graph.py
    dedup_keep_best, the production curation policy).
    ``exact`` supports only drop (its keep-min semantics have no pair
    form)."""

    strategy: str = "exact"
    mode: str = "drop"
    # exact
    keys: list[str] = field(default_factory=list)
    order_column: str = ""
    # approximate strategies
    id_column: str = ""
    text_column: str = ""
    vector_column: str = ""
    threshold: float = 0.5
    num_perm: int = 64
    bands: int = 16
    shingle_size: int = 3
    max_hamming: int = 3
    ngram_size: int = 3
    n_planes: int = 8
    n_tables: int = 2
    seed: int = 42
    max_bucket: int = 1000
    run_len: int = 8
    min_shared: int = 1
    max_dist: int = 8
    prefix_chars: int = 40
    block_tokens: int = 2
    len_band: int = 8
    # keep_best
    score_column: str = ""
    operation_type: str = "dedup"

    def __post_init__(self) -> None:
        if self.strategy not in (
            "exact", "minhash", "simhash", "ngram", "embedding", "substring", "fuzzy"
        ):
            raise SpecError(
                f"dedup strategy must be exact/minhash/simhash/ngram/embedding/"
                f"substring/fuzzy, got {self.strategy!r}"
            )
        if self.mode not in ("drop", "pairs", "components", "cluster_drop", "keep_best"):
            raise SpecError(
                f"dedup mode must be drop/pairs/components/cluster_drop/"
                f"keep_best, got {self.mode!r}"
            )
        if self.mode == "keep_best" and not self.score_column:
            raise SpecError("dedup mode='keep_best' requires score_column")
        if self.strategy == "exact":
            if self.mode != "drop":
                raise SpecError("dedup strategy='exact' supports mode='drop' only")
            if not self.keys or not self.order_column:
                raise SpecError("dedup strategy='exact' requires keys and order_column")
        elif self.strategy == "embedding":
            if not self.id_column or not self.vector_column:
                raise SpecError(
                    "dedup strategy='embedding' requires id_column and vector_column"
                )
        elif not self.id_column or not self.text_column:
            raise SpecError(f"dedup strategy={self.strategy!r} requires id_column and text_column")


@dataclass
class SimilarityOperation(Operation):
    """ANN top-k as a flow op: the CURRENT frame is the corpus, the
    query side resolves like bind's right side (named input key or file
    path).  method ∈ brute (exact broadcast baseline) / lsh / ivf
    (approximate scale paths — functions/similarity.py)."""

    method: str = "brute"
    queries_path: str = ""
    queries_schema_columns: dict[str, str] = field(default_factory=dict)
    id_column: str = "vec_id"
    vector_column: str = "embedding"
    k: int = 10
    n_planes: int = 4
    n_tables: int = 8
    n_centroids: int = 16
    nprobe: int = 4
    seed: int = 42
    operation_type: str = "similarity"

    def __post_init__(self) -> None:
        if self.method not in ("brute", "lsh", "ivf"):
            raise SpecError(f"similarity method must be brute/lsh/ivf, got {self.method!r}")
        if not self.queries_path:
            raise SpecError("similarity requires queries_path (named input or file path)")
        if self.k <= 0:
            raise SpecError(f"similarity k must be positive, got {self.k!r}")


@dataclass
class AsofJoinOperation(Operation):
    """As-of join as a flow op (functions/asof.py): attach the latest
    (backward) / earliest (forward) right row's value_columns per key;
    right side resolves like bind's."""

    right_file_path: str = ""
    right_schema_columns: dict[str, str] = field(default_factory=dict)
    left_on: str = ""
    right_on: str = ""
    left_time: str = ""
    right_time: str = ""
    value_columns: list[str] = field(default_factory=list)
    direction: str = "backward"
    suffix: str = "_asof"
    # None = unbounded; seconds otherwise (stale matches revert to NULL)
    tolerance: float | None = None
    operation_type: str = "asof_join"

    def __post_init__(self) -> None:
        if self.direction not in ("backward", "forward"):
            raise SpecError(
                f"asof_join direction must be backward/forward, got {self.direction!r}"
            )
        if self.tolerance is not None and not self.tolerance >= 0:
            # `not (x >= 0)` also rejects NaN, which would otherwise
            # silently disable the staleness bound
            raise SpecError(
                f"asof_join tolerance must be >= 0, got {self.tolerance!r}"
            )
        for f_name in ("right_file_path", "left_on", "right_on", "left_time", "right_time"):
            if not getattr(self, f_name):
                raise SpecError(f"asof_join requires {f_name}")
        if not self.value_columns:
            raise SpecError("asof_join requires value_columns")


@dataclass
class RangeJoinOperation(Operation):
    """Range join as a flow op (functions/range_join.py).

    kind='tolerance': SELF pair join — rows sharing ``key`` with
    |t_a - t_b| <= tolerance seconds (bucketed, one shuffle).
    kind='interval': point-in-interval join against a right side
    resolved like bind's (start_column <= t <= end_column per key).
    kind='overlap': interval × interval overlap join — the current
    frame's [left_start_column, left_end_column] ranges against the
    right side's [start_column, end_column] ranges per ``key``,
    emitting (key, left_id, right_id, overlap_us); dup-free by the
    canonical-bucket condition (functions/range_join.py
    interval_overlap_join)."""

    kind: str = "tolerance"
    # tolerance (self-join)
    key: str = ""
    time_column: str = ""
    id_column: str = ""
    tolerance: float = 60.0
    # interval (two-sided)
    right_file_path: str = ""
    right_schema_columns: dict[str, str] = field(default_factory=dict)
    left_on: str = ""
    right_on: str = ""
    start_column: str = ""
    end_column: str = ""
    value_columns: list[str] = field(default_factory=list)
    bucket_width: float = 3600.0
    # overlap (two-sided interval × interval)
    left_id_column: str = ""
    right_id_column: str = ""
    left_start_column: str = ""
    left_end_column: str = ""
    operation_type: str = "range_join"

    def __post_init__(self) -> None:
        if self.kind not in ("tolerance", "interval", "overlap"):
            raise SpecError(
                f"range_join kind must be tolerance/interval/overlap, got {self.kind!r}"
            )
        if self.kind == "overlap":
            for f_name in (
                "right_file_path", "key", "left_id_column", "right_id_column",
                "left_start_column", "left_end_column", "start_column",
                "end_column",
            ):
                if not getattr(self, f_name):
                    raise SpecError(f"range_join kind='overlap' requires {f_name}")
            if self.bucket_width <= 0:
                raise SpecError(
                    f"range_join bucket_width must be positive, got {self.bucket_width!r}"
                )
            return
        if self.kind == "tolerance":
            if not self.key or not self.time_column or not self.id_column:
                raise SpecError(
                    "range_join kind='tolerance' requires key, time_column, id_column"
                )
            if self.tolerance <= 0:
                raise SpecError(f"range_join tolerance must be positive, got {self.tolerance!r}")
        else:
            for f_name in (
                "right_file_path", "left_on", "right_on",
                "time_column", "start_column", "end_column",
            ):
                if not getattr(self, f_name):
                    raise SpecError(f"range_join kind='interval' requires {f_name}")
            if not self.value_columns:
                raise SpecError("range_join kind='interval' requires value_columns")


@dataclass
class ContaminationOperation(Operation):
    """Benchmark-contamination check as a flow op
    (functions/curation.py): the CURRENT frame is the corpus, the
    benchmark side resolves like bind's right side (named input key or
    file path).  mode ∈ annotate (return per-doc overlap stats:
    id, n_shingles, n_hits, contamination_rate, contaminated) /
    filter (return the corpus with contaminated rows removed)."""

    benchmark_path: str = ""
    benchmark_schema_columns: dict[str, str] = field(default_factory=dict)
    id_column: str = "doc_id"
    text_column: str = "text"
    benchmark_text_column: str = ""
    ngram_size: int = 3
    rate_threshold: float = 0.3
    mode: str = "annotate"
    # strategy='near' switches from exact shingle overlap to banded
    # MinHash near-dup pairing (functions/curation.py
    # near_contamination) — catches paraphrased benchmark items the
    # exact check misses.  The near-specific knobs below are ignored
    # under strategy='exact'.
    strategy: str = "exact"
    jaccard_threshold: float = 0.5
    num_perm: int = 64
    bands: int = 16
    max_bucket: int = 1000
    operation_type: str = "contamination"

    def __post_init__(self) -> None:
        if not self.benchmark_path:
            raise SpecError(
                "contamination requires benchmark_path (named input or file path)"
            )
        if self.mode not in ("annotate", "filter"):
            raise SpecError(
                f"contamination mode must be annotate/filter, got {self.mode!r}"
            )
        if self.strategy not in ("exact", "near"):
            raise SpecError(
                f"contamination strategy must be exact/near, got {self.strategy!r}"
            )
        if self.strategy == "near":
            if not 0.0 < self.jaccard_threshold <= 1.0:
                raise SpecError(
                    "contamination jaccard_threshold must be in (0, 1], got "
                    f"{self.jaccard_threshold!r}"
                )
            if self.num_perm <= 0 or self.bands <= 0 or self.num_perm % self.bands:
                raise SpecError(
                    "contamination num_perm must be a positive multiple of bands, "
                    f"got num_perm={self.num_perm!r} bands={self.bands!r}"
                )


@dataclass
class SnapshotDiffOperation(Operation):
    """Table-version diff as a flow op (functions/profile.py
    snapshot_diff): the CURRENT frame is the NEW snapshot, the OLD
    snapshot resolves like bind's right side.  mode ∈ labels (one row
    per key: key columns + diff_status ∈ added/removed/changed/
    unchanged) / counts ((diff_status, n) summary)."""

    old_path: str = ""
    old_schema_columns: dict[str, str] = field(default_factory=dict)
    key_columns: list[str] = field(default_factory=list)
    compare_columns: list[str] = field(default_factory=list)
    mode: str = "labels"
    operation_type: str = "snapshot_diff"

    def __post_init__(self) -> None:
        if not self.old_path:
            raise SpecError("snapshot_diff requires old_path (named input or file path)")
        if not self.key_columns or not self.compare_columns:
            raise SpecError("snapshot_diff requires key_columns and compare_columns")
        if self.mode not in ("labels", "counts"):
            raise SpecError(
                f"snapshot_diff mode must be labels/counts, got {self.mode!r}"
            )


@dataclass
class ProvenanceOperation(Operation):
    """Ingest-lineage columns from Spark's hidden file metadata
    (``_metadata``): stamp every row with the physical file it was
    scanned from (and optionally size / modification time) — the audit
    columns a landing-zone pipeline carries so any downstream row can
    be traced back to its source object.  Valid only on frames that
    originate from a file scan (parquet/csv/json/orc/text); a derived
    frame with no file lineage fails at analysis with a clear error.

    ``fields``: subset of path / name / size / mtime (default
    [name]) — ``name`` is the basename, ``path`` the full URI."""

    column_prefix: str = "src_"
    fields: list[str] = field(default_factory=lambda: ["name"])
    operation_type: str = "provenance"

    def __post_init__(self) -> None:
        bad = [f for f in self.fields if f not in ("path", "name", "size", "mtime")]
        if bad or not self.fields:
            raise SpecError(
                f"provenance fields must be a non-empty subset of "
                f"path/name/size/mtime, got {self.fields!r}"
            )


@dataclass
class ScrubOperation(Operation):
    """Text scrubbing / redaction as a flow op (functions/curation.py
    scrub_text): an ordered regexp_replace chain.  ``rules`` is a list
    of [pattern, replacement] pairs; empty = the default PII set
    (emails, URLs, IPv4s, digit runs)."""

    input_column: str = "text"
    output_column: str = ""
    rules: list[list[str]] = field(default_factory=list)
    operation_type: str = "scrub"

    def __post_init__(self) -> None:
        for r in self.rules:
            if len(r) != 2:
                raise SpecError(
                    f"scrub rules must be [pattern, replacement] pairs, got {r!r}"
                )


@dataclass
class PackSequencesOperation(Operation):
    """Sequence packing (concat-and-chunk) as a flow op
    (functions/curation.py): annotates every row with its global token
    offset, context-window chunk id, and span in ``id_column`` order —
    the two-phase distributed prefix scan, never a global single
    -partition window."""

    id_column: str = "doc_id"
    text_column: str = "text"
    context_length: int = 512
    operation_type: str = "pack_sequences"

    def __post_init__(self) -> None:
        if self.context_length <= 0:
            raise SpecError(
                f"pack_sequences context_length must be positive, got {self.context_length!r}"
            )


@dataclass
class RepetitionOperation(Operation):
    """Intra-document repetition signals as a flow op (functions/text.py
    with_repetition): adds ``dup_{n}gram_frac`` per n — the repetitious-
    text quality screen for pretraining corpora."""

    input_column: str = "text"
    ns: list[int] = field(default_factory=lambda: [2, 3])
    operation_type: str = "repetition"

    def __post_init__(self) -> None:
        if not self.ns or any((not isinstance(n, int)) or n < 1 for n in self.ns):
            raise SpecError(f"repetition ns must be positive ints, got {self.ns!r}")


@dataclass
class MixtureOperation(Operation):
    """Deterministic per-group dataset mixing as a flow op
    (functions/curation.py weighted_mixture): each row in group ``g``
    with weight ``w`` is kept/replicated ``floor(w)`` times plus a
    hash-chosen extra copy with probability ``frac(w)`` — domain/epoch
    re-weighting for training-data pipelines, engine-exact (same md5
    bucket contract as SampleOperation.key_column)."""

    group_column: str = ""
    key_column: str = ""
    weights: dict[str, float] = field(default_factory=dict)
    default_weight: float = 1.0
    seed: int = 42
    copy_column: str = "copy"
    operation_type: str = "mixture"

    def __post_init__(self) -> None:
        if not self.group_column or not self.key_column:
            raise SpecError("mixture requires group_column and key_column")
        for g, w in {**self.weights, "<default>": self.default_weight}.items():
            if not isinstance(w, (int, float)) or w < 0:
                raise SpecError(f"mixture weight for {g!r} must be >= 0, got {w!r}")


@dataclass
class MergeOperation(Operation):
    """CDC merge as a flow op (functions/incremental.py merge_changes):
    the CURRENT frame is the base snapshot, the change feed resolves
    like bind's right side (named input key or file path).  The feed
    must carry the base's full column payload plus optional
    ``op_column`` (rows equal to ``delete_value`` remove the key) and
    ``seq_column`` (highest sequence wins per key)."""

    right_file_path: str = ""
    right_schema_columns: dict[str, str] = field(default_factory=dict)
    keys: list[str] = field(default_factory=list)
    op_column: str = ""
    delete_value: str = "D"
    seq_column: str = ""
    operation_type: str = "merge"

    def __post_init__(self) -> None:
        if not self.right_file_path:
            raise SpecError("merge requires right_file_path (named input or file path)")
        if not self.keys:
            raise SpecError("merge requires keys")


@dataclass
class Scd2Operation(Operation):
    """SCD2 history build as a flow op (functions/incremental.py
    scd2_history): collapse a change log into validity intervals
    (valid_from / valid_to / is_current) per key.  ``collapse`` opens a
    new version only when an attr_column actually changes (null-safe)."""

    keys: list[str] = field(default_factory=list)
    ts_column: str = ""
    attr_columns: list[str] = field(default_factory=list)
    order_column: str = ""
    collapse: bool = True
    operation_type: str = "scd2"

    def __post_init__(self) -> None:
        if not self.keys or not self.ts_column or not self.attr_columns:
            raise SpecError("scd2 requires keys, ts_column and attr_columns")


@dataclass
class StratifiedSampleOperation(Operation):
    """Exact-quota stratified sampling as a flow op (functions/
    curation.py stratified_sample): k rows per group, ranked by
    md5(key ∥ seed) — deterministic and partition-independent, unlike
    fraction-based sampling."""

    group_columns: list[str] = field(default_factory=list)
    key_column: str = ""
    k: int = 0
    seed: int = 42
    rank_column: str = ""
    operation_type: str = "stratified_sample"

    def __post_init__(self) -> None:
        if not self.group_columns or not self.key_column:
            raise SpecError("stratified_sample requires group_columns and key_column")
        if self.k <= 0:
            raise SpecError(f"stratified_sample k must be positive, got {self.k!r}")


@dataclass
class WeightedSampleOperation(Operation):
    """Weighted (PPS) sampling as a flow op (functions/curation.py
    weighted_sample — sequential Poisson): k rows per group with
    inclusion probability ≈ proportional to ``weight_column``; rows
    with NULL/non-positive weight are excluded.  Deterministic,
    partition-independent, engine-exact."""

    group_columns: list[str] = field(default_factory=list)
    key_column: str = ""
    weight_column: str = ""
    k: int = 0
    seed: int = 42
    rank_column: str = ""
    operation_type: str = "weighted_sample"

    def __post_init__(self) -> None:
        if not self.group_columns or not self.key_column or not self.weight_column:
            raise SpecError(
                "weighted_sample requires group_columns, key_column and "
                "weight_column"
            )
        if self.k <= 0:
            raise SpecError(f"weighted_sample k must be positive, got {self.k!r}")


@dataclass
class ChunkOperation(Operation):
    """Overlapping-window text chunking as a flow op (functions/
    curation.py chunk_text): one output row per ``chunk_size``-token
    window advancing ``chunk_size - overlap`` tokens."""

    id_column: str = "doc_id"
    text_column: str = "text"
    chunk_size: int = 512
    overlap: int = 0
    operation_type: str = "chunk"

    def __post_init__(self) -> None:
        if self.chunk_size <= 0:
            raise SpecError(f"chunk chunk_size must be positive, got {self.chunk_size!r}")
        if not (0 <= self.overlap < self.chunk_size):
            raise SpecError(
                f"chunk overlap must be in [0, chunk_size), got {self.overlap!r}"
            )


@dataclass
class KeywordSearchOperation(Operation):
    """Ranked keyword retrieval as a flow op (functions/search.py
    keyword_search_topk): rational-idf BM25 top-k for a fixed list of
    query terms over the current frame."""

    query_terms: list[str] = field(default_factory=list)
    id_column: str = "doc_id"
    text_column: str = "text"
    k: int = 10
    k1: float = 1.2
    b: float = 0.75
    operation_type: str = "keyword_search"

    def __post_init__(self) -> None:
        if not self.query_terms:
            raise SpecError("keyword_search requires query_terms")
        folded = [str(t).lower() for t in self.query_terms]
        if len(set(folded)) != len(folded):
            raise SpecError(
                f"keyword_search query_terms must be unique (case-folded), "
                f"got {self.query_terms!r}"
            )
        if self.k <= 0:
            raise SpecError(f"keyword_search k must be positive, got {self.k!r}")


@dataclass
class InvertedIndexOperation(Operation):
    """Inverted-index build as a flow op (functions/search.py
    inverted_index): term → df, tf_total, id-sorted posting string;
    ``max_df`` = 0 disables the hot-term posting cap."""

    id_column: str = "doc_id"
    text_column: str = "text"
    max_df: int = 0
    operation_type: str = "inverted_index"

    def __post_init__(self) -> None:
        if self.max_df < 0:
            raise SpecError(f"inverted_index max_df must be >= 0, got {self.max_df!r}")


@dataclass
class FuzzyPairsOperation(Operation):
    """Blocked edit-distance pair join as a flow op (functions/fuzzy.py
    fuzzy_pairs): (id_a, id_b, dist) for same-block rows whose
    normalized prefixes are within ``max_dist`` Levenshtein edits."""

    id_column: str = "doc_id"
    string_column: str = "text"
    max_dist: int = 8
    prefix_chars: int = 40
    block_tokens: int = 2
    len_band: int = 8
    max_bucket: int = 500
    operation_type: str = "fuzzy_pairs"

    def __post_init__(self) -> None:
        if self.max_dist < 0:
            raise SpecError(f"fuzzy_pairs max_dist must be >= 0, got {self.max_dist!r}")
        for fld in ("prefix_chars", "block_tokens", "len_band", "max_bucket"):
            if getattr(self, fld) <= 0:
                raise SpecError(
                    f"fuzzy_pairs {fld} must be positive, got {getattr(self, fld)!r}"
                )


@dataclass
class TfidfOperation(Operation):
    """Per-document top-k TF-IDF keyword extraction as a flow op
    (functions/search.py tfidf_topk): (id, rank, term, tfidf) with the
    rational-idf weight and (weight desc, term asc) tie-break."""

    id_column: str = "doc_id"
    text_column: str = "text"
    k: int = 3
    operation_type: str = "tfidf"

    def __post_init__(self) -> None:
        if self.k <= 0:
            raise SpecError(f"tfidf k must be positive, got {self.k!r}")


@dataclass
class BigramLmOperation(Operation):
    """Corpus bigram-LM transition counts as a flow op
    (functions/text.py bigram_lm_topk): top-k (w1, w2, n, p) with the
    exact-integer MLE conditional probability."""

    text_column: str = "text"
    k: int = 50
    operation_type: str = "bigram_lm"

    def __post_init__(self) -> None:
        if self.k <= 0:
            raise SpecError(f"bigram_lm k must be positive, got {self.k!r}")


@dataclass
class DocLmScoreOperation(Operation):
    """Bigram-LM document quality scoring as a flow op
    (functions/text.py doc_lm_score): each document's mean in-LM
    transition probability + OOV count against the corpus's own top-k
    bigram LM — the CCNet-style LM filter stage."""

    id_column: str = "doc_id"
    text_column: str = "text"
    k: int = 500
    operation_type: str = "doc_lm_score"

    def __post_init__(self) -> None:
        if self.k <= 0:
            raise SpecError(f"doc_lm_score k must be positive, got {self.k!r}")


@dataclass
class BpeTrainOperation(Operation):
    """Full iterative BPE tokenizer training as a flow op
    (functions/text.py bpe_train): n_merges rounds of weighted pair
    counting + greedy merge over the corpus word-frequency vocab,
    returning the learned merge table."""

    text_column: str = "text"
    n_merges: int = 5
    operation_type: str = "bpe_train"

    def __post_init__(self) -> None:
        if self.n_merges <= 0:
            raise SpecError(
                f"bpe_train n_merges must be positive, got {self.n_merges!r}"
            )


@dataclass
class BpeEncodeOperation(Operation):
    """BPE encode step as a flow op (functions/text.py bpe_encode):
    apply a shipped merge table — ``merges`` is a list of [left, right]
    pairs in rank order — returning per-doc symbol counts."""

    id_column: str = "doc_id"
    text_column: str = "text"
    merges: list[list[str]] = field(default_factory=list)
    operation_type: str = "bpe_encode"

    def __post_init__(self) -> None:
        for m in self.merges:
            if len(m) != 2 or not all(isinstance(x, str) and x for x in m):
                raise SpecError(
                    f"bpe_encode merges must be [left, right] string pairs, got {m!r}"
                )


@dataclass
class VocabOovOperation(Operation):
    """Rare-token/OOV quality scoring as a flow op (functions/text.py
    vocab_oov): per-doc token totals and out-of-vocabulary counts
    against the corpus's own top-``top_k`` vocabulary."""

    id_column: str = "doc_id"
    text_column: str = "text"
    top_k: int = 1000
    operation_type: str = "vocab_oov"

    def __post_init__(self) -> None:
        if self.top_k <= 0:
            raise SpecError(f"vocab_oov top_k must be positive, got {self.top_k!r}")


@dataclass
class ClusteringOperation(Operation):
    """Deterministic quantized k-means as a flow op (functions/
    clustering.py).  mode ∈ assign (per-vector cluster + distance) /
    sample (cluster-balanced ``per_cluster`` quota draw)."""

    mode: str = "assign"
    id_column: str = "vec_id"
    vector_column: str = "embedding"
    k: int = 8
    iters: int = 2
    per_cluster: int = 10
    scale_bits: int = 20
    operation_type: str = "kmeans"

    def __post_init__(self) -> None:
        if self.mode not in ("assign", "sample"):
            raise SpecError(f"kmeans mode must be assign/sample, got {self.mode!r}")
        if self.k <= 0 or self.iters < 0:
            raise SpecError("kmeans requires k > 0 and iters >= 0")
        if self.mode == "sample" and self.per_cluster <= 0:
            raise SpecError(
                f"kmeans sample per_cluster must be positive, got {self.per_cluster!r}"
            )
        # a negative value would surface later as a cryptic Python
        # 'negative shift count' from 1 << scale_bits; a huge one
        # silently overflows the quantized grid's usable int64 range
        if not 0 <= self.scale_bits <= 40:
            raise SpecError(
                f"kmeans scale_bits must be in [0, 40], got {self.scale_bits!r}"
            )


@dataclass
class ProfileOperation(Operation):
    """ANALYZE-style column statistics as a flow op (functions/
    profile.py profile_columns).  ``columns`` empty = all columns;
    ``approx`` swaps exact COUNT(DISTINCT) for the HLL sketch (the
    petabyte path)."""

    columns: list[str] = field(default_factory=list)
    approx: bool = False
    operation_type: str = "profile"


@dataclass
class HistogramOperation(Operation):
    """Fixed-width value histogram as a flow op (functions/profile.py
    value_histogram).  ``lo``/``hi`` omitted (None) derive from the
    column min/max."""

    input_column: str = ""
    bins: int = 20
    lo: float | None = None
    hi: float | None = None
    operation_type: str = "histogram"

    def __post_init__(self) -> None:
        if not self.input_column:
            raise SpecError("histogram requires input_column")
        if self.bins <= 0:
            raise SpecError(f"histogram bins must be positive, got {self.bins!r}")
        if self.lo is not None and self.hi is not None and not self.hi > self.lo:
            raise SpecError(f"histogram needs hi > lo, got [{self.lo!r}, {self.hi!r}]")


@dataclass
class OutlierOperation(Operation):
    """Z-score outlier screen as a flow op (functions/profile.py
    outlier_flags): adds zscore + is_outlier per row; ``group_columns``
    switches to per-stratum statistics."""

    input_column: str = ""
    z_threshold: float = 3.0
    group_columns: list[str] = field(default_factory=list)
    operation_type: str = "outliers"

    def __post_init__(self) -> None:
        if not self.input_column:
            raise SpecError("outliers requires input_column")
        if self.z_threshold <= 0:
            raise SpecError(
                f"outliers z_threshold must be positive, got {self.z_threshold!r}"
            )


@dataclass
class SplitAssignOperation(Operation):
    """Deterministic dataset-split assignment as a flow op
    (functions/text.py with_split_assign): each row gets a named split
    from the md5-bucket of its key — stable as the dataset grows,
    identical on any engine or partitioning."""

    key_column: str = ""
    splits: dict[str, int] = field(default_factory=dict)
    output_column: str = "split"
    operation_type: str = "split_assign"

    def __post_init__(self) -> None:
        if not self.key_column:
            raise SpecError("split_assign requires key_column")
        if self.splits and sum(self.splits.values()) != 100:
            raise SpecError(
                f"split_assign percentages must total 100, got {self.splits!r}"
            )
        if self.splits and any(p <= 0 for p in self.splits.values()):
            raise SpecError(
                f"split_assign percentages must all be positive, got {self.splits!r}"
            )


@dataclass
class IncrementalDedupOperation(Operation):
    """Append-batch dedup as a flow op (functions/incremental.py
    incremental_dedup): the CURRENT frame is the incoming batch, the
    existing corpus resolves like bind's right side.  mode ∈ annotate
    (add is_known / is_batch_dup flags) / filter (keep admissible
    rows)."""

    corpus_path: str = ""
    corpus_schema_columns: dict[str, str] = field(default_factory=dict)
    id_column: str = "doc_id"
    text_column: str = "text"
    mode: str = "annotate"
    # strategy='near' switches the match key from the exact normalized-
    # text fingerprint to banded MinHash near-duplication (functions/
    # incremental.py incremental_neardup) — catches paraphrased
    # re-crawls the fingerprint gate admits.  The knobs below are
    # ignored under strategy='exact'.
    strategy: str = "exact"
    jaccard_threshold: float = 0.5
    num_perm: int = 64
    bands: int = 16
    shingle_size: int = 3
    max_bucket: int = 1000
    operation_type: str = "incremental_dedup"

    def __post_init__(self) -> None:
        if not self.corpus_path:
            raise SpecError(
                "incremental_dedup requires corpus_path (named input or file path)"
            )
        if self.mode not in ("annotate", "filter"):
            raise SpecError(
                f"incremental_dedup mode must be annotate/filter, got {self.mode!r}"
            )
        if self.strategy not in ("exact", "near"):
            raise SpecError(
                f"incremental_dedup strategy must be exact/near, got {self.strategy!r}"
            )
        if self.strategy == "near":
            if not 0.0 < self.jaccard_threshold <= 1.0:
                raise SpecError(
                    "incremental_dedup jaccard_threshold must be in (0, 1], got "
                    f"{self.jaccard_threshold!r}"
                )
            if self.num_perm <= 0 or self.bands <= 0 or self.num_perm % self.bands:
                raise SpecError(
                    "incremental_dedup num_perm must be a positive multiple of "
                    f"bands, got num_perm={self.num_perm!r} bands={self.bands!r}"
                )


@dataclass
class GlobalShuffleOperation(Operation):
    """Deterministic global training-order shuffle as a flow op
    (functions/curation.py global_shuffle): every row gets an
    md5(key || '-' || seed) shuffle key and its exact 1-based global
    rank — reproducible from (key, seed) alone, independent of engine
    and partitioning."""

    key_column: str = ""
    seed: int = 42
    shuffle_key_column: str = "shuffle_key"
    position_column: str = "position"
    operation_type: str = "global_shuffle"

    def __post_init__(self) -> None:
        if not self.key_column:
            raise SpecError("global_shuffle requires key_column")
        if self.shuffle_key_column == self.position_column:
            raise SpecError(
                "global_shuffle shuffle_key_column and position_column must differ"
            )


@dataclass
class QuantileFilterOperation(Operation):
    """Per-group quantile quality gate as a flow op
    (functions/curation.py quantile_filter): keep rows whose value is
    at or above their group's q-quantile — a relative threshold that
    cannot wipe out an entire group."""

    group_columns: list[str] = field(default_factory=list)
    value_column: str = ""
    q: float = 0.75
    threshold_column: str = ""
    operation_type: str = "quantile_filter"

    def __post_init__(self) -> None:
        if not self.group_columns:
            raise SpecError("quantile_filter requires group_columns")
        if not self.value_column:
            raise SpecError("quantile_filter requires value_column")
        if not 0.0 < self.q < 1.0:
            raise SpecError(
                f"quantile_filter q must be in (0, 1), got {self.q!r}"
            )


@dataclass
class TokenizeIdsOperation(Operation):
    """Last-mile integer tokenization as a flow op (functions/text.py
    tokenize_ids): map each document to ids against the corpus's own
    top-k vocabulary; replaces the frame with (id, n_tokens, n_oov,
    token_ids)."""

    id_column: str = "doc_id"
    text_column: str = "text"
    top_k: int = 1000
    oov_id: int = 0
    operation_type: str = "tokenize_ids"

    def __post_init__(self) -> None:
        if self.top_k <= 0:
            raise SpecError(f"tokenize_ids top_k must be positive, got {self.top_k!r}")


@dataclass
class CurriculumOrderOperation(Operation):
    """Deterministic curriculum ordering as a flow op
    (functions/curation.py curriculum_order): global rank by a score
    column (desc NULLS LAST by default; ascending for easy-to-hard),
    optional batch assignment."""

    score_column: str = ""
    id_column: str = "doc_id"
    ascending: bool = False
    position_column: str = "position"
    batch_size: int = 0  # 0 = no batch column
    batch_column: str = "batch_id"
    operation_type: str = "curriculum_order"

    def __post_init__(self) -> None:
        if not self.score_column:
            raise SpecError("curriculum_order requires score_column")
        if self.batch_size < 0:
            raise SpecError(
                f"curriculum_order batch_size must be >= 0, got {self.batch_size!r}"
            )


@dataclass
class StoreGateOperation(Operation):
    """Admission gate against a persisted signature store as a flow op
    (functions/incremental.py dedup_gate_from_store /
    neardup_gate_from_store): the CURRENT frame is the incoming batch;
    ``store_path`` names the parquet store built by the matching
    build_* function.  strategy ∈ exact (fingerprint store) / near
    (band store); mode ∈ annotate / filter."""

    store_path: str = ""
    id_column: str = "doc_id"
    text_column: str = "text"
    strategy: str = "exact"
    mode: str = "annotate"
    shingle_size: int = 3
    bands: int = 4
    rows_per_band: int = 3
    seed: int = 7
    operation_type: str = "store_gate"

    def __post_init__(self) -> None:
        if not self.store_path:
            raise SpecError("store_gate requires store_path")
        if self.strategy not in ("exact", "near"):
            raise SpecError(
                f"store_gate strategy must be exact/near, got {self.strategy!r}"
            )
        if self.mode not in ("annotate", "filter"):
            raise SpecError(f"store_gate mode must be annotate/filter, got {self.mode!r}")
        # bands = 0 would silently admit EVERY document (no band rows →
        # empty known set); rows_per_band = 0 dies with a bare
        # IndexError inside the band fold — fail at parse time instead
        for fld in ("shingle_size", "bands", "rows_per_band"):
            if getattr(self, fld) < 1:
                raise SpecError(
                    f"store_gate {fld} must be >= 1, got {getattr(self, fld)!r}"
                )


@dataclass
class GopherRulesOperation(Operation):
    """Gopher-style rule-filter battery as a flow op
    (functions/text.py gopher_rules): per-rule booleans + conjunctive
    ``gopher_pass``; mode='annotate' keeps metrics and flags,
    mode='filter' keeps only passing rows of the ORIGINAL frame."""

    id_column: str = "doc_id"
    text_column: str = "text"
    mode: str = "annotate"
    min_words: int = 5
    max_words: int = 100_000
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 12.0
    max_symbol_ratio: float = 0.1
    max_bullet_ratio: float = 0.9
    max_ellipsis_ratio: float = 0.3
    min_alpha_ratio: float = 0.7
    min_stop_hits: int = 2
    operation_type: str = "gopher_rules"

    def __post_init__(self) -> None:
        if self.mode not in ("annotate", "filter"):
            raise SpecError(
                f"gopher_rules mode must be annotate/filter, got {self.mode!r}"
            )
        if self.min_words < 0 or self.max_words < self.min_words:
            raise SpecError(
                "gopher_rules requires 0 <= min_words <= max_words, got "
                f"{self.min_words!r}/{self.max_words!r}"
            )
        if self.min_stop_hits < 0:
            raise SpecError(
                f"gopher_rules min_stop_hits must be >= 0, got {self.min_stop_hits!r}"
            )


@dataclass
class LineDedupOperation(Operation):
    """C4-style corpus-wide boilerplate line removal as a flow op
    (functions/curation.py line_dedup): normalized non-blank lines
    occurring in more than ``max_docs`` distinct documents are
    stripped from every document; the text column is REPLACED by the
    rebuilt text."""

    id_column: str = "doc_id"
    text_column: str = "text"
    max_docs: int = 1
    group_column: str | None = None
    min_df: int | None = None
    operation_type: str = "line_dedup"

    def __post_init__(self) -> None:
        if self.max_docs < 1:
            raise SpecError(
                f"line_dedup max_docs must be >= 1, got {self.max_docs!r}"
            )
        if self.min_df is not None and self.min_df < 1:
            raise SpecError(
                f"line_dedup min_df must be >= 1 when set, got {self.min_df!r}"
            )


@dataclass
class HtmlToTextOperation(Operation):
    """HTML → plain-text extraction as a flow op (functions/curation.py
    html_to_text): the text column is REPLACED by the extracted text
    (or written to ``output_column`` when set)."""

    input_column: str = "text"
    operation_type: str = "html_to_text"


@dataclass
class ClassifierScoreOperation(Operation):
    """Hashed linear quality classifier as a flow op
    (functions/classifier.py): mode='annotate' appends n_tokens /
    score / clf_pass; mode='filter' keeps passing rows and drops the
    metric columns.  ``weights_path`` loads a trained weight artifact
    (JSON list or parquet (bucket, weight) rows — see
    save_classifier_weights) instead of the seeded stub table; ``dim``
    must match the artifact."""

    id_column: str = "doc_id"
    text_column: str = "text"
    dim: int = 1024
    seed: int = 42
    bias: float = 0.0
    threshold: float = 0.0
    mode: str = "annotate"
    weights_path: str | None = None
    operation_type: str = "classifier_score"

    def __post_init__(self) -> None:
        if self.mode not in ("annotate", "filter"):
            raise SpecError(
                f"classifier_score mode must be annotate|filter, got {self.mode!r}"
            )
        if self.dim < 1:
            raise SpecError(f"classifier_score dim must be >= 1, got {self.dim!r}")


@dataclass
class ClassifierTrainOperation(Operation):
    """Deterministic distributed classifier TRAINING as a flow op
    (functions/classifier.py classifier_train): full-batch perceptron
    with integer per-bucket gradients and halving power-of-two steps
    over the CURRENT frame's ``label_column`` (+1/-1 integers, or a
    BOOLEAN such as a rule battery's pass flag, mapped true→+1 /
    false→-1 — the rule-distillation recipe), then scores the
    frame with the trained weights.  ``save_path`` (optional) persists
    the weight artifact (JSON list or parquet, by extension) for later
    ``classifier_score weights_path=`` serving.  mode='annotate'
    appends n_tokens / score / clf_pass; mode='filter' keeps passing
    rows."""

    id_column: str = "doc_id"
    text_column: str = "text"
    label_column: str = ""
    dim: int = 256
    iters: int = 8
    lr_bits: int = 10
    bias: float = 0.0
    threshold: float = 0.0
    mode: str = "annotate"
    save_path: str | None = None
    operation_type: str = "classifier_train"

    def __post_init__(self) -> None:
        if not self.label_column:
            raise SpecError("classifier_train requires label_column (+1/-1)")
        if self.mode not in ("annotate", "filter"):
            raise SpecError(
                f"classifier_train mode must be annotate|filter, got {self.mode!r}"
            )
        if self.dim < 1:
            raise SpecError(f"classifier_train dim must be >= 1, got {self.dim!r}")
        if self.iters < 1:
            raise SpecError(
                f"classifier_train iters must be >= 1, got {self.iters!r}"
            )
        if not 0 <= self.lr_bits <= 40 or self.lr_bits + self.iters > 52:
            raise SpecError(
                f"classifier_train needs lr_bits in [0, 40] and lr_bits + iters "
                f"<= 52, got lr_bits={self.lr_bits!r}, iters={self.iters!r}"
            )


@dataclass
class UrlNormalizeOperation(Operation):
    """URL normalization as a flow op (functions/web.py url_normalize):
    lowercase scheme/host, strip fragments, default ports, and tracking
    query params; appends ``output_column``."""

    url_column: str = "url"
    output_column: str = "url_norm"
    operation_type: str = "url_normalize"


@dataclass
class DomainExtractOperation(Operation):
    """Domain + apex-domain extraction from a URL column
    (functions/web.py domain_extract)."""

    url_column: str = "url"
    domain_column: str = "domain"
    apex_column: str = "apex_domain"
    operation_type: str = "domain_extract"


@dataclass
class DomainQuotaOperation(Operation):
    """Per-domain document cap (functions/web.py domain_quota): keep
    the top ``n_per_domain`` rows of each domain by ``order_column``
    (descending unless ``ascending``), ties broken by ``tie_column``
    ascending — the RefinedWeb/C4 crawl-balance gate."""

    domain_column: str = "domain"
    order_column: str = ""
    n_per_domain: int = 100
    tie_column: str = ""
    ascending: bool = False
    operation_type: str = "domain_quota"

    def __post_init__(self) -> None:
        if not self.order_column or not self.tie_column:
            raise SpecError(
                "domain_quota requires order_column and tie_column "
                "(deterministic per-domain ranking)"
            )
        if self.n_per_domain < 1:
            raise SpecError(
                f"domain_quota n_per_domain must be >= 1, got {self.n_per_domain!r}"
            )


@dataclass
class LmBucketsOperation(Operation):
    """CCNet-style per-language LM quality bucketing as a flow op
    (functions/text.py lm_quality_buckets): head/middle/tail by each
    language's own score quantiles."""

    id_column: str = "doc_id"
    text_column: str = "text"
    lang_column: str = "lang"
    k: int = 500
    operation_type: str = "lm_buckets"

    def __post_init__(self) -> None:
        if self.k <= 0:
            raise SpecError(f"lm_buckets k must be positive, got {self.k!r}")


@dataclass
class GapFillOperation(Operation):
    """Hourly gap fill + forward fill as a flow op
    (functions/timeseries.py gap_fill_hourly): REPLACES the frame with
    the dense per-key hourly grid (key, hour_idx, n_events, observed,
    filled_sum) — the resample-and-ffill stage of a metrics pipeline."""

    key_column: str = ""
    ts_column: str = "ts"
    value_column: str = "value"
    max_span_hours: int = 24 * 366
    operation_type: str = "gap_fill"

    def __post_init__(self) -> None:
        if not self.key_column:
            raise SpecError("gap_fill requires key_column")
        if self.max_span_hours < 1:
            raise SpecError(
                f"gap_fill max_span_hours must be >= 1, got {self.max_span_hours!r}"
            )


@dataclass
class BloomGateOperation(Operation):
    """Broadcast Bloom-filter membership gate as a flow op
    (functions/bloom.py): the CURRENT frame is the corpus, the
    benchmark/eval side resolves like bind's right side (named input
    key or file path) and packs into an m-bit bitmap served as a pure
    projection — the shuffle-free decontamination pre-filter.
    mode ∈ annotate (append ``bloom_hit`` 1/0) / filter (drop hits —
    conservative: deterministic false positives drop too)."""

    eval_path: str = ""
    eval_schema_columns: dict[str, str] = field(default_factory=dict)
    text_column: str = "text"
    eval_text_column: str = ""
    m: int = 1 << 16
    k: int = 3
    mode: str = "annotate"
    operation_type: str = "bloom_gate"

    def __post_init__(self) -> None:
        if not self.eval_path:
            raise SpecError("bloom_gate requires eval_path (input key or file path)")
        if self.m < 64 or self.m % 64:
            raise SpecError(f"bloom_gate m must be a positive multiple of 64, got {self.m!r}")
        if self.k < 1:
            raise SpecError(f"bloom_gate k must be >= 1, got {self.k!r}")
        if self.mode not in ("annotate", "filter"):
            raise SpecError(f"bloom_gate mode must be annotate|filter, got {self.mode!r}")


@dataclass
class HllDistinctOperation(Operation):
    """Deterministic HLL distinct estimate as a flow op
    (functions/sketch.py): REPLACES the frame with one row per group
    (group_columns, n_buckets_used, hll_est)."""

    key_column: str = ""
    group_columns: list[str] = field(default_factory=list)
    p: int = 8
    operation_type: str = "hll_distinct"

    def __post_init__(self) -> None:
        if not self.key_column or not self.group_columns:
            raise SpecError("hll_distinct requires key_column and group_columns")
        if not 4 <= self.p <= 16:
            raise SpecError(f"hll_distinct p must be in [4, 16], got {self.p!r}")


@dataclass
class QuantileSketchOperation(Operation):
    """Deterministic mergeable quantile estimates as a flow op
    (functions/quantile.py): REPLACES the frame with one row per
    (group, q) — ``group_columns, q, est``.  ``min_group_rows``
    (optional) engages the map-side hash prefilter; it is a
    caller-asserted LOWER BOUND on every group's non-null row count."""

    value_column: str = ""
    id_column: str = ""
    group_columns: list[str] = field(default_factory=list)
    qs: list[float] = field(default_factory=lambda: [0.5])
    k: int = 1024
    min_group_rows: int | None = None
    operation_type: str = "quantile_sketch"

    def __post_init__(self) -> None:
        if not self.value_column or not self.id_column or not self.group_columns:
            raise SpecError(
                "quantile_sketch requires value_column, id_column and group_columns"
            )
        if self.k < 1:
            raise SpecError(f"quantile_sketch k must be >= 1, got {self.k!r}")
        if not self.qs:
            raise SpecError("quantile_sketch requires at least one quantile in qs")
        from .functions.quantile import _q_parts

        for q in self.qs:
            # _q_parts is the single float↔rational authority (the same
            # conversion the Spark build and the oracle generator use);
            # any parse/range failure surfaces as SpecError like every
            # other field validation here.
            try:
                _q_parts(q)
            except (ValueError, TypeError, ZeroDivisionError) as exc:
                raise SpecError(
                    f"quantile_sketch qs must be numbers in (0, 1], got {q!r}"
                ) from exc
        if self.min_group_rows is not None and self.min_group_rows < self.k:
            raise SpecError(
                f"quantile_sketch min_group_rows ({self.min_group_rows!r}) must "
                f"be >= k ({self.k!r})"
            )


@dataclass
class SqlTransformOperation(Operation):
    """Ad-hoc Spark SQL over the CURRENT frame — the declarative
    escape hatch for anything the op vocabulary lacks: the frame is
    registered as the temp view named by ``view`` (default ``frame``),
    ``statement`` runs against it, and its result REPLACES the frame.
    Catalyst treats the statement like any other plan fragment
    (pushdown/pruning/codegen compose across the boundary).  The
    statement must be a single SELECT/WITH query — DDL/DML is
    rejected at parse time (a pipeline op must not mutate catalogs).

    ``views`` optionally exposes OTHER pipeline inputs to the
    statement: ``{view_name: input_key}`` registers each named input
    (resolved against the config's inputs dict, the union/bind
    side-resolve pattern) as an additional temp view for the
    statement's lifetime — so ad-hoc joins across declared inputs stay
    inside the declarative escape hatch."""

    statement: str = ""
    view: str = "frame"
    views: dict[str, str] = field(default_factory=dict)
    operation_type: str = "sql_transform"

    def __post_init__(self) -> None:
        if not self.statement or not self.statement.strip():
            raise SpecError("sql_transform requires a statement")
        if not isinstance(self.views, dict):
            raise SpecError(
                f"sql_transform views must map view names to input keys, "
                f"got {self.views!r}"
            )
        for vname, key in self.views.items():
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", str(vname)):
                raise SpecError(
                    f"sql_transform views key must be a bare identifier, "
                    f"got {vname!r}"
                )
            if not key or not isinstance(key, str):
                raise SpecError(
                    f"sql_transform views[{vname!r}] must name an input key, "
                    f"got {key!r}"
                )
        if self.view in self.views:
            raise SpecError(
                f"sql_transform views may not reuse the frame view name "
                f"{self.view!r}"
            )
        # fast parse-time sanity check (comments stripped, leading
        # parens allowed); the AUTHORITATIVE DML/DDL guard walks the
        # parsed logical plan at apply time — a leading-keyword test
        # alone is bypassable (WITH x AS (...) INSERT INTO ...)
        body = re.sub(r"/\*.*?\*/", " ", self.statement, flags=re.S)
        body = re.sub(r"--[^\n]*", " ", body)
        if not re.match(r"\s*\(*\s*(SELECT|WITH)\b", body, flags=re.I):
            raise SpecError(
                "sql_transform statement must be a single SELECT/WITH query"
            )
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", self.view):
            raise SpecError(
                f"sql_transform view must be a bare identifier, got {self.view!r}"
            )


@dataclass
class ExpectationsOperation(Operation):
    """Row-level data-quality expectations as a flow op
    (functions/expectations.py).  Rules support per-column checks
    (not_null/min/max/in_set/regex/unique), cross-column ``expr``
    checks (a named boolean expression in the shared Spark/DuckDB SQL
    subset), and per-rule ``severity`` (``fail`` default; ``warn``
    rules are counted/flagged but never quarantine or enforce).
    ``mode``:
    - ``summary`` (default): REPLACES the frame with one row per rule
      (``rule, severity, n_rows, n_violations, violation_rate``);
    - ``annotate``: adds per-rule ``ok_<column>_<check>`` booleans and
      the conjunctive ``expect_pass`` (per-row rules only);
    - ``filter``: keeps only rows passing every per-row rule;
    - ``enforce``: frame passes through with an ``expect_checked``
      guard column; materialization FAILS loudly on the first
      violating row (the strict-cast contract)."""

    rules: list[dict] = field(default_factory=list)
    mode: str = "summary"
    operation_type: str = "expectations"

    def __post_init__(self) -> None:
        if self.mode not in ("summary", "annotate", "filter", "enforce"):
            raise SpecError(
                f"expectations mode must be summary/annotate/filter/enforce, "
                f"got {self.mode!r}"
            )
        from .functions.expectations import AGG_CHECKS, validate_rules

        try:
            validate_rules(self.rules)
        except ValueError as exc:
            raise SpecError(str(exc)) from exc
        if self.mode != "summary":
            aggish = [
                f"{r['column']}:{r['check']}"
                for r in self.rules
                if isinstance(r, dict) and r.get("check") in AGG_CHECKS
            ]
            if aggish:
                raise SpecError(
                    f"expectations mode={self.mode!r} needs per-row rules only; "
                    f"aggregate-shaped rules {aggish} work in mode='summary'"
                )


@dataclass
class TimeWeightedAvgOperation(Operation):
    """Time-weighted average per key as a flow op
    (functions/timeseries.py time_weighted_avg): REPLACES the frame
    with one row per key that has >= 2 observations — ``key,
    n_segments, total_ms, twa`` (each value held until the key's next
    observation; duration-weighted mean)."""

    key_column: str = ""
    ts_column: str = "ts"
    value_column: str = "value"
    id_column: str = ""
    q_bits: int = 16
    operation_type: str = "time_weighted_avg"

    def __post_init__(self) -> None:
        if not self.key_column or not self.id_column:
            raise SpecError("time_weighted_avg requires key_column and id_column")
        if not 0 <= self.q_bits <= 30:
            raise SpecError(
                f"time_weighted_avg q_bits must be in [0, 30], got {self.q_bits!r}"
            )


@dataclass
class RollupOperation(Operation):
    """Continuous-aggregate rollup as a flow op (functions/rollup.py):
    REPLACES the frame with one row per (group, time bucket) —
    ``group_columns..., bucket_idx, n_rows, n_vals, sum_q, sum_v,
    avg_v, min_v, max_v``.  ``grain`` is the bucket width in seconds
    (3600 = hour); ``coarsen_factor`` re-buckets the built partials by
    FLOOR(bucket/factor) before serving (hour partials → day serve)."""

    ts_column: str = ""
    value_column: str = ""
    group_columns: list[str] = field(default_factory=list)
    grain: int = 3600
    coarsen_factor: int | None = None
    q_bits: int = 20
    operation_type: str = "rollup_aggregate"

    def __post_init__(self) -> None:
        if not self.ts_column or not self.value_column or not self.group_columns:
            raise SpecError(
                "rollup_aggregate requires ts_column, value_column and "
                "group_columns"
            )
        if self.grain < 1:
            raise SpecError(f"rollup_aggregate grain must be >= 1, got {self.grain!r}")
        if self.coarsen_factor is not None and self.coarsen_factor < 1:
            raise SpecError(
                f"rollup_aggregate coarsen_factor must be >= 1, got "
                f"{self.coarsen_factor!r}"
            )
        if not 0 <= self.q_bits <= 40:
            raise SpecError(
                f"rollup_aggregate q_bits must be in [0, 40], got {self.q_bits!r}"
            )


@dataclass
class HeavyHittersOperation(Operation):
    """Exact heavy hitters behind the lossless CMS prefilter as a flow
    op (functions/cms.py cms_heavy_hitters): REPLACES the frame with
    one row per group whose row count reaches ``threshold`` —
    ``group_columns..., <count_column>``."""

    group_columns: list[str] = field(default_factory=list)
    threshold: int = 0
    w: int = 256
    d: int = 3
    count_column: str = "cnt"
    operation_type: str = "heavy_hitters"

    def __post_init__(self) -> None:
        if not self.group_columns:
            raise SpecError("heavy_hitters requires group_columns")
        if self.threshold < 1:
            raise SpecError(
                f"heavy_hitters threshold must be >= 1, got {self.threshold!r}"
            )
        if self.w < 2 or self.d < 1:
            raise SpecError(
                f"heavy_hitters needs w >= 2 and d >= 1, got w={self.w!r} "
                f"d={self.d!r}"
            )
        if self.w * self.d > 8192:
            raise SpecError(
                f"heavy_hitters w*d must be <= 8192 (plan-literal table), got "
                f"{self.w * self.d}"
            )


@dataclass
class ClassifierEvalOperation(Operation):
    """Threshold-sweep gate evaluation as a flow op
    (functions/classifier.py classifier_eval): REPLACES the frame
    (which must already carry a score column and a boolean label
    column) with one row per candidate threshold — confusion counts
    plus accuracy/precision/recall/F1."""

    label_column: str = ""
    score_column: str = "score"
    thresholds: list[float] = field(default_factory=lambda: [0.0])
    operation_type: str = "classifier_eval"

    def __post_init__(self) -> None:
        if not self.label_column:
            raise SpecError("classifier_eval requires label_column")
        if not self.thresholds:
            raise SpecError("classifier_eval requires at least one threshold")
        if len(set(self.thresholds)) != len(self.thresholds):
            raise SpecError(
                f"classifier_eval thresholds must be distinct: {self.thresholds!r}"
            )


@dataclass
class CmsCountsOperation(Operation):
    """Count-min frequency estimates as a flow op (functions/cms.py):
    builds the d·w counter table over the CURRENT frame's key column
    and REPLACES the frame with (key, est_count) for the probe side —
    a named input key or file path, like bind's right side.  An empty
    probe_path probes the frame's own distinct keys."""

    key_column: str = ""
    probe_path: str = ""
    probe_schema_columns: dict[str, str] = field(default_factory=dict)
    probe_key_column: str = ""
    w: int = 1024
    d: int = 3
    operation_type: str = "cms_counts"

    def __post_init__(self) -> None:
        if not self.key_column:
            raise SpecError("cms_counts requires key_column")
        if self.w < 2 or self.d < 1:
            raise SpecError(
                f"cms_counts needs w >= 2 and d >= 1, got w={self.w!r} d={self.d!r}"
            )
        if not self.probe_path and (self.probe_key_column or self.probe_schema_columns):
            raise SpecError(
                "cms_counts: probe_key_column/probe_schema_columns are only "
                "meaningful with probe_path (the self-probe default uses "
                "key_column)"
            )


@dataclass
class OhlcOperation(Operation):
    """Per-key OHLC candlestick bars as a flow op
    (functions/timeseries.py ohlc_bars): REPLACES the frame with one
    row per (key, time bucket) — ``key, bucket, open, high, low,
    close, n_obs``."""

    key_column: str = ""
    ts_column: str = "ts"
    value_column: str = "value"
    bucket_seconds: int = 3600
    operation_type: str = "ohlc"

    def __post_init__(self) -> None:
        if not self.key_column:
            raise SpecError("ohlc requires key_column")
        if self.bucket_seconds < 1:
            raise SpecError(
                f"ohlc bucket_seconds must be >= 1, got {self.bucket_seconds!r}"
            )


@dataclass
class EwmaOperation(Operation):
    """Per-key bounded-lookback EWMA smoothing as a flow op
    (functions/timeseries.py ewma_smooth): REPLACES the frame with
    ``key, <id_column>, value, ewma`` ordered (key, ts, id)."""

    key_column: str = ""
    ts_column: str = "ts"
    id_column: str = ""
    value_column: str = "value"
    alpha_num: int = 1
    alpha_den: int = 4
    lookback: int = 64
    operation_type: str = "ewma"

    def __post_init__(self) -> None:
        if not self.key_column or not self.id_column:
            raise SpecError("ewma requires key_column and id_column")
        if not (0 < self.alpha_num < self.alpha_den):
            raise SpecError(
                f"ewma needs 0 < alpha_num < alpha_den, got "
                f"{self.alpha_num!r}/{self.alpha_den!r}"
            )
        if self.lookback < 1:
            raise SpecError(f"ewma lookback must be >= 1, got {self.lookback!r}")


@dataclass
class RollingMedianOperation(Operation):
    """Per-key rolling lower-median smoothing as a flow op
    (functions/timeseries.py rolling_median): REPLACES the frame with
    ``key, <id_column>, value, med`` ordered (key, ts, id)."""

    key_column: str = ""
    ts_column: str = "ts"
    id_column: str = ""
    value_column: str = "value"
    window_rows: int = 5
    operation_type: str = "rolling_median"

    def __post_init__(self) -> None:
        if not self.key_column or not self.id_column:
            raise SpecError("rolling_median requires key_column and id_column")
        if self.window_rows < 1:
            raise SpecError(
                f"rolling_median window_rows must be >= 1, got {self.window_rows!r}"
            )


@dataclass
class ChangepointOperation(Operation):
    """Per-key CUSUM changepoint audit as a flow op
    (functions/timeseries.py changepoint_cusum): REPLACES the frame
    with one row per key — ``key, change_day, cusum_scaled, strength,
    n_days, total``."""

    key_column: str = ""
    ts_column: str = "ts"
    operation_type: str = "changepoint"

    def __post_init__(self) -> None:
        if not self.key_column:
            raise SpecError("changepoint requires key_column")


@dataclass
class AssociationRulesOperation(Operation):
    """Directed association rules as a flow op (functions/mining.py
    association_rules): REPLACES the frame with the top-``k`` rules —
    ``antecedent, consequent, n_pair, n_ante, n_cons, support,
    confidence, lift``."""

    basket_column: str = ""
    item_column: str = ""
    min_count: int = 2
    k: int = 100
    operation_type: str = "association_rules"

    def __post_init__(self) -> None:
        if not self.basket_column or not self.item_column:
            raise SpecError("association_rules requires basket_column and item_column")
        if self.k < 1 or self.min_count < 1:
            raise SpecError(
                f"association_rules needs k >= 1 and min_count >= 1, got "
                f"{self.k!r}/{self.min_count!r}"
            )


@dataclass
class MarkovOperation(Operation):
    """First-order Markov transition matrix as a flow op
    (functions/mining.py markov_transitions): REPLACES the frame with
    ``src, dst, n_trans, n_src, prob``."""

    seq_column: str = ""
    order_column: str = "ts"
    tiebreak_column: str = ""
    state_column: str = ""
    operation_type: str = "markov"

    def __post_init__(self) -> None:
        if not self.seq_column or not self.tiebreak_column or not self.state_column:
            raise SpecError(
                "markov requires seq_column, tiebreak_column and state_column"
            )


@dataclass
class SkylineOperation(Operation):
    """2-D skyline (Pareto frontier, maximizing both axes) as a flow
    op (functions/mining.py skyline2d): REPLACES the frame with the
    frontier rows ``id, x, y``.  The X axis must be an INTEGRAL
    column (the unit-step RANGE frame — skyline2d refuses fractional
    x loudly); y carries no frame and may be any orderable type."""

    id_column: str = ""
    x_column: str = ""
    y_column: str = ""
    prune_buckets: int = 32
    operation_type: str = "skyline"

    def __post_init__(self) -> None:
        if not self.id_column or not self.x_column or not self.y_column:
            raise SpecError("skyline requires id_column, x_column and y_column")
        if self.prune_buckets < 1:
            raise SpecError(
                f"skyline prune_buckets must be >= 1, got {self.prune_buckets!r}"
            )


@dataclass
class KAnonymityOperation(Operation):
    """k-anonymity screen as a flow op (functions/integrity.py
    k_anonymity): REPLACES the frame with the quasi-identifier
    combinations whose group size is below ``k`` (quasi columns +
    ``group_size``) — the cells a privacy release must suppress."""

    quasi_columns: list[str] = field(default_factory=list)
    k: int = 0
    operation_type: str = "k_anonymity"

    def __post_init__(self) -> None:
        if not self.quasi_columns:
            raise SpecError("k_anonymity requires quasi_columns")
        if self.k < 1:
            raise SpecError(f"k_anonymity k must be >= 1, got {self.k!r}")


@dataclass
class BenfordOperation(Operation):
    """Benford first-digit audit as a flow op (functions/integrity.py
    benford_audit): REPLACES the frame with one row per digit 1..9
    (``digit, obs, obs_frac, expected_frac, chi2_term``).  The column
    must be INTEGER-valued (cast monetary doubles to exact cents
    upstream with arithmetic + casting ops)."""

    input_column: str = ""
    operation_type: str = "benford"

    def __post_init__(self) -> None:
        if not self.input_column:
            raise SpecError("benford requires input_column")


@dataclass
class MediaFeaturesOperation(Operation):
    """Media featurization as a flow op (functions/multimodal.py
    extract_image_features / extract_audio_features): opaque binary
    payloads → fixed-dim feature rows in one Arrow mapInPandas stage.
    REPLACES the frame with the feature table (image: ``media_id,
    mime, n_bytes, n_pixels, feature``; audio: ``media_id, mime,
    n_bytes, n_samples, duration_ms, feature``).  Pair with a
    ``binary``-format input (sources/io.py binaryFile scan) to run a
    directory-of-media-files corpus through the YAML surface.

    ``decoder='real'`` runs the built-in BMP/PNM/PNG/baseline-JPEG
    codecs (audio: RIFF/WAVE PCM), Pillow/PyAV only as gated
    fallbacks; ``'fake'`` is the deterministic byte-histogram stub for
    plumbing tests.  ``strict=True`` (real only) fails loudly on an
    undecodable NON-EMPTY payload instead of emitting the zero vector
    — the trusted-format-corpus setting."""

    modality: str = "image"
    payload_column: str = "payload"
    id_column: str = "media_id"
    mime_column: str = "mime"
    dim: int = 16
    decoder: str = "fake"
    strict: bool = False
    operation_type: str = "media_features"

    def __post_init__(self) -> None:
        if self.modality not in ("image", "audio"):
            raise SpecError(
                f"media_features modality must be image/audio, got {self.modality!r}"
            )
        if self.decoder not in ("fake", "real"):
            raise SpecError(
                f"media_features decoder must be fake/real, got {self.decoder!r}"
            )
        if not isinstance(self.dim, int) or self.dim < 1:
            raise SpecError(f"media_features dim must be a positive int, got {self.dim!r}")
        if self.strict and self.decoder != "real":
            raise SpecError(
                "media_features strict=true requires decoder='real' (the fake "
                "byte-histogram path never decodes, so it cannot detect "
                "undecodable payloads)"
            )
        if not self.payload_column or not self.id_column or not self.mime_column:
            raise SpecError(
                "media_features requires payload_column, id_column, mime_column"
            )


@dataclass
class AnnStoreBuildOperation(Operation):
    """BUILD a persisted ANN index from the current frame as a flow op
    (functions/similarity.py build_ann_store / functions/pq.py
    build_pq_store): the CURRENT frame is the corpus; ``store_path``
    receives the parquet store (centroids + meta + cid-partitioned
    inverted lists; ``kind='pq'`` adds codebooks + a refine layer).
    REPLACES the frame with the build manifest — one row per inverted
    list, ``(cid, n_vectors)`` ordered by cid — read back from the
    written store, so the sink records what actually landed on disk.
    Rebuilding from the same corpus reproduces the same index
    bit-for-bit (hash-sampled integer Lloyd's)."""

    store_path: str = ""
    id_column: str = "vec_id"
    vector_column: str = "embedding"
    kind: str = "ivf"
    n_centroids: int = 16
    iters: int = 2
    sample_size: int = 2048
    scale_bits: int = 20
    m: int = 8
    k_codes: int = 16
    operation_type: str = "ann_store_build"

    def __post_init__(self) -> None:
        if not self.store_path:
            raise SpecError("ann_store_build requires store_path")
        if self.kind not in ("ivf", "pq"):
            raise SpecError(
                f"ann_store_build kind must be ivf/pq, got {self.kind!r}"
            )
        if not self.id_column or not self.vector_column:
            raise SpecError("ann_store_build requires id_column and vector_column")
        for fld in ("n_centroids", "iters", "sample_size", "scale_bits"):
            if not isinstance(getattr(self, fld), int) or getattr(self, fld) < 1:
                raise SpecError(
                    f"ann_store_build {fld} must be a positive int, "
                    f"got {getattr(self, fld)!r}"
                )
        if self.kind == "pq":
            # m=0 would divide the vector into no subspaces (ZeroDivision
            # deep in the codebook fit); k_codes<2 fits a degenerate
            # single-word codebook that quantizes everything to one point
            if not isinstance(self.m, int) or self.m < 1:
                raise SpecError(f"ann_store_build m must be >= 1, got {self.m!r}")
            if not isinstance(self.k_codes, int) or self.k_codes < 2:
                raise SpecError(
                    f"ann_store_build k_codes must be >= 2, got {self.k_codes!r}"
                )


@dataclass
class AnnStoreAppendOperation(Operation):
    """Incrementally ADD the current frame to a persisted ANN store as
    a flow op (functions/similarity.py append_to_ann_store): each
    vector is assigned to its nearest EXISTING centroid (the coarse
    quantizer is immutable after build) and appended into that cid's
    list directory — O(|batch|) regardless of index size; the existing
    lists are never read or rewritten.  IVF-PQ stores are refused (the
    shared header gate — their lists hold codes).  At-most-once:
    appending the same batch twice duplicates rows.  REPLACES the
    frame with the store manifest ``(cid, n_vectors)`` AFTER the
    append — the same read-back shape as ann_store_build."""

    store_path: str = ""
    id_column: str = "vec_id"
    vector_column: str = "embedding"
    operation_type: str = "ann_store_append"

    def __post_init__(self) -> None:
        if not self.store_path:
            raise SpecError("ann_store_append requires store_path")
        if not self.id_column or not self.vector_column:
            raise SpecError("ann_store_append requires id_column and vector_column")


@dataclass
class AnnStoreQueryOperation(Operation):
    """SERVE a query batch against a persisted ANN store as a flow op
    (functions/similarity.py ann_from_store / functions/pq.py
    ann_pq_from_store — the store kind is auto-detected from its meta
    table, so one op serves both layouts): the CURRENT frame is the
    query batch; only the ``nprobe`` probed inverted-list DIRECTORIES
    are read (partition pruning).  REPLACES the frame with
    ``(query_id, neighbor_id, rank, cosine)`` — exact cosine of every
    emitted neighbor, self-matches excluded.  ``refine_factor`` only
    applies to PQ stores (exact re-rank width)."""

    store_path: str = ""
    id_column: str = "vec_id"
    vector_column: str = "embedding"
    k: int = 10
    nprobe: int = 4
    refine_factor: int = 4
    scale_bits: int = 20
    operation_type: str = "ann_store_query"

    def __post_init__(self) -> None:
        if not self.store_path:
            raise SpecError("ann_store_query requires store_path")
        if not self.id_column or not self.vector_column:
            raise SpecError("ann_store_query requires id_column and vector_column")
        for fld in ("k", "nprobe", "refine_factor", "scale_bits"):
            if not isinstance(getattr(self, fld), int) or getattr(self, fld) < 1:
                raise SpecError(
                    f"ann_store_query {fld} must be a positive int, "
                    f"got {getattr(self, fld)!r}"
                )


@dataclass
class FkCheckOperation(Operation):
    """Foreign-key orphan audit as a flow op (functions/integrity.py
    fk_orphans): the CURRENT frame is the CHILD; the parent resolves
    like bind's right side (named input or file path).  REPLACES the
    frame with the 1-row audit (``relationship, child_rows, null_keys,
    orphan_rows, orphan_keys``)."""

    child_key: str = ""
    parent_path: str = ""
    parent_key: str = ""
    parent_schema_columns: dict[str, str] = field(default_factory=dict)
    name: str = ""
    operation_type: str = "fk_check"

    def __post_init__(self) -> None:
        if not self.child_key or not self.parent_path or not self.parent_key:
            raise SpecError("fk_check requires child_key, parent_path and parent_key")
        if not self.name:
            self.name = f"{self.child_key}->{self.parent_key}"


@dataclass
class SeasonalBaselineOperation(Operation):
    """Day-of-week seasonal profile as a flow op
    (functions/timeseries.py seasonal_baseline): REPLACES the frame
    with one row per (key, dow): ``key, dow, n_events, mean_value,
    lift``."""

    key_column: str = ""
    ts_column: str = "ts"
    value_column: str = "value"
    operation_type: str = "seasonal_baseline"

    def __post_init__(self) -> None:
        if not self.key_column:
            raise SpecError("seasonal_baseline requires key_column")


@dataclass
class AutocorrOperation(Operation):
    """Daily-count autocorrelation as a flow op
    (functions/timeseries.py autocorr_lags): REPLACES the frame with
    one row per lag 1..max_lag: ``lag, n_pairs, autocorr``."""

    ts_column: str = "ts"
    max_lag: int = 7
    operation_type: str = "autocorr"

    def __post_init__(self) -> None:
        if self.max_lag < 1:
            raise SpecError(f"autocorr max_lag must be >= 1, got {self.max_lag!r}")


@dataclass
class ItemSimilarityOperation(Operation):
    """Item–item cosine similarity as a flow op (functions/mining.py
    item_similarity): REPLACES the frame with one row per co-occurring
    item pair: ``item_a, item_b, users_both, cosine``."""

    user_column: str = ""
    item_column: str = ""
    operation_type: str = "item_similarity"

    def __post_init__(self) -> None:
        if not self.user_column or not self.item_column:
            raise SpecError("item_similarity requires user_column and item_column")


@dataclass
class LinkPredictionOperation(Operation):
    """Common-neighbor link prediction as a flow op
    (functions/graph.py link_prediction): REPLACES the frame with the
    top-k item pairs by Jaccard of their group sets: ``item_a, item_b,
    co_groups, jaccard``."""

    group_column: str = ""
    item_column: str = ""
    k: int = 100
    operation_type: str = "link_prediction"

    def __post_init__(self) -> None:
        if not self.group_column or not self.item_column:
            raise SpecError("link_prediction requires group_column and item_column")
        if self.k < 1:
            raise SpecError(f"link_prediction k must be >= 1, got {self.k!r}")


@dataclass
class AbTestOperation(Operation):
    """Welch two-sample z-test as a flow op (functions/stats.py
    welch_z_test): REPLACES the frame with the 1-row readout
    ``n_a, mean_a, var_a, n_b, mean_b, var_b, z_score``."""

    cohort_column: str = ""
    cohort_a: str = ""
    cohort_b: str = ""
    value_column: str = "value"
    operation_type: str = "ab_test"

    def __post_init__(self) -> None:
        if not self.cohort_column or not self.cohort_a or not self.cohort_b:
            raise SpecError("ab_test requires cohort_column, cohort_a and cohort_b")
        if self.cohort_a == self.cohort_b:
            raise SpecError("ab_test cohorts must differ")


@dataclass
class KsTestOperation(Operation):
    """Two-sample Kolmogorov–Smirnov test as a flow op
    (functions/stats.py ks_two_sample): REPLACES the frame with the
    1-row readout ``n_a, n_b, ks_d, ks_stat``."""

    cohort_column: str = ""
    cohort_a: str = ""
    cohort_b: str = ""
    value_column: str = "value"
    operation_type: str = "ks_test"

    def __post_init__(self) -> None:
        if not self.cohort_column or not self.cohort_a or not self.cohort_b:
            raise SpecError("ks_test requires cohort_column, cohort_a and cohort_b")
        if self.cohort_a == self.cohort_b:
            raise SpecError("ks_test cohorts must differ")


OPERATION_TYPES: dict[str, type[Operation]] = {
    "equality": EqualityOperation,
    "concatenation": ConcatenationOperation,
    "application": ApplicationOperation,
    "switching": SwitchingOperation,
    "assignation": AssignationOperation,
    "casting": CastingOperation,
    "arithmetic": ArithmeticOperation,
    "comparison": ComparisonOperation,
    "bind": BindOperation,
    "fold": FoldOperation,
    "unfold": UnfoldOperation,
    # extensions
    "filter": FilterOperation,
    "aggregation": AggregationOperation,
    "sort": SortOperation,
    "limit": LimitOperation,
    "distinct": DistinctOperation,
    "union": UnionOperation,
    "window": WindowOperation,
    "repartition": RepartitionOperation,
    "sample": SampleOperation,
    "select": SelectOperation,
    "json_extract": JsonExtractOperation,
    # north-star operations (dedup/similarity/asof/range — SURVEY §2 ext)
    "dedup": DedupOperation,
    "similarity": SimilarityOperation,
    "asof_join": AsofJoinOperation,
    "range_join": RangeJoinOperation,
    "contamination": ContaminationOperation,
    "pack_sequences": PackSequencesOperation,
    "provenance": ProvenanceOperation,
    "scrub": ScrubOperation,
    "repetition": RepetitionOperation,
    "mixture": MixtureOperation,
    # incremental maintenance + curation (round 3)
    "merge": MergeOperation,
    "snapshot_diff": SnapshotDiffOperation,
    "scd2": Scd2Operation,
    "stratified_sample": StratifiedSampleOperation,
    "weighted_sample": WeightedSampleOperation,
    "chunk": ChunkOperation,
    "keyword_search": KeywordSearchOperation,
    "fuzzy_pairs": FuzzyPairsOperation,
    "tfidf": TfidfOperation,
    "bigram_lm": BigramLmOperation,
    "doc_lm_score": DocLmScoreOperation,
    "inverted_index": InvertedIndexOperation,
    "vocab_oov": VocabOovOperation,
    "bpe_train": BpeTrainOperation,
    "bpe_encode": BpeEncodeOperation,
    "kmeans": ClusteringOperation,
    "incremental_dedup": IncrementalDedupOperation,
    "split_assign": SplitAssignOperation,
    "profile": ProfileOperation,
    "histogram": HistogramOperation,
    "outliers": OutlierOperation,
    "global_shuffle": GlobalShuffleOperation,
    "quantile_filter": QuantileFilterOperation,
    "gopher_rules": GopherRulesOperation,
    "lm_buckets": LmBucketsOperation,
    "line_dedup": LineDedupOperation,
    "html_to_text": HtmlToTextOperation,
    "classifier_score": ClassifierScoreOperation,
    "classifier_train": ClassifierTrainOperation,
    "url_normalize": UrlNormalizeOperation,
    "domain_extract": DomainExtractOperation,
    "domain_quota": DomainQuotaOperation,
    "tokenize_ids": TokenizeIdsOperation,
    "curriculum_order": CurriculumOrderOperation,
    "store_gate": StoreGateOperation,
    "ann_store_build": AnnStoreBuildOperation,
    "ann_store_append": AnnStoreAppendOperation,
    "ann_store_query": AnnStoreQueryOperation,
    "gap_fill": GapFillOperation,
    "bloom_gate": BloomGateOperation,
    "hll_distinct": HllDistinctOperation,
    "cms_counts": CmsCountsOperation,
    "quantile_sketch": QuantileSketchOperation,
    "rollup_aggregate": RollupOperation,
    "time_weighted_avg": TimeWeightedAvgOperation,
    "expectations": ExpectationsOperation,
    "sql_transform": SqlTransformOperation,
    "heavy_hitters": HeavyHittersOperation,
    "classifier_eval": ClassifierEvalOperation,
    "ohlc": OhlcOperation,
    "ewma": EwmaOperation,
    "rolling_median": RollingMedianOperation,
    "changepoint": ChangepointOperation,
    "association_rules": AssociationRulesOperation,
    "markov": MarkovOperation,
    "skyline": SkylineOperation,
    # integrity / recommender / seasonal family (round 10)
    "k_anonymity": KAnonymityOperation,
    "benford": BenfordOperation,
    "media_features": MediaFeaturesOperation,
    "fk_check": FkCheckOperation,
    "seasonal_baseline": SeasonalBaselineOperation,
    "autocorr": AutocorrOperation,
    "item_similarity": ItemSimilarityOperation,
    "link_prediction": LinkPredictionOperation,
    "ab_test": AbTestOperation,
    "ks_test": KsTestOperation,
}


def parse_operation(raw: dict[str, Any]) -> Operation:
    """Parse one raw op dict via the ``operation_type`` discriminator
    (reference: discriminated union at app/models.py:122-137)."""
    if not isinstance(raw, dict) or "operation_type" not in raw:
        raise SpecError(f"operation spec must be a dict with operation_type, got {raw!r}")
    op_type = raw["operation_type"]
    cls = OPERATION_TYPES.get(op_type)
    if cls is None:
        raise SpecError(
            f"Unknown operation_type {op_type!r}. Known: {sorted(OPERATION_TYPES)}"
        )
    known = {f for f in cls.__dataclass_fields__}  # type: ignore[attr-defined]
    # Unknown keys fail LOUDLY (deliberate deviation from the
    # reference's lenient pydantic parsing): a silently-dropped key
    # means a typo'd or unsupported knob reverts to its default and
    # the pipeline runs with the WRONG semantics — caught in the wild
    # when a gopher_rules threshold was ignored and a trained gate
    # learned the degenerate all-pass label.  The message is
    # LLM-feedback-grade: it names the field and the valid set.
    unknown = sorted(set(raw) - known)
    if unknown:
        raise SpecError(
            f"Unknown field(s) {unknown} for operation_type {op_type!r}. "
            f"Valid fields: {sorted(known - {'operation_type'})}"
        )
    kwargs = {k: v for k, v in raw.items() if k in known}
    try:
        return cls(**kwargs)
    except TypeError as exc:
        raise SpecError(f"Invalid spec for {op_type}: {exc}") from exc


# ---------------------------------------------------------------------------
# File / pipeline model (reference: app/models.py:21-35,141-149)
# ---------------------------------------------------------------------------


@dataclass
class ColumnDefinition:
    type: str
    description: str | None = None


@dataclass
class FileSchema:
    name: str
    columns: dict[str, ColumnDefinition]

    def logical_types(self) -> dict[str, str]:
        return {name: cd.type for name, cd in self.columns.items()}


@dataclass
class FileDefinition:
    path: str
    file_schema: FileSchema
    format: str = "csv"

    def __post_init__(self) -> None:
        # text/binary are INPUT-only formats (raw corpus lines, opaque
        # media payloads); save_data rejects them at write time.
        if self.format not in ("csv", "json", "parquet", "orc", "text", "binary"):
            raise SpecError(
                f"format must be csv/json/parquet/orc/text/binary, got {self.format!r}"
            )


@dataclass
class PipelineConfig:
    inputs: dict[str, FileDefinition]
    outputs: dict[str, FileDefinition]

    def __post_init__(self) -> None:
        if not self.inputs or not self.outputs:
            raise SpecError(
                "pipeline config needs at least one input and one output "
                "(reference: app/main.py:348-351)"
            )


@dataclass
class PipelineFlow:
    """The flat op-list IR (reference: app/models.py:146-149)."""

    source: str
    operations: list[Operation]


def _parse_file_definition(raw: dict[str, Any]) -> FileDefinition:
    schema_raw = raw.get("file_schema", {})
    # Any key other than name/columns is almost always the FLAT
    # {col: type} mis-nesting (the schema belongs under 'columns');
    # silently parsing it as zero columns turns every downstream op
    # into "input column not found" far from the real mistake — the
    # parse_operation unknown-key lesson, applied to the config side.
    # A name-only schema (columns legitimately empty) stays valid.
    stray = sorted(set(schema_raw) - {"name", "columns"})
    if stray:
        raise SpecError(
            f"file_schema for path {raw.get('path')!r} has unknown key(s) "
            f"{stray} — column declarations belong under 'columns': "
            "file_schema: {name: ..., columns: {col: {type: ...}, ...}}"
        )
    cols = {
        name: ColumnDefinition(
            type=cd["type"] if isinstance(cd, dict) else str(cd),
            description=(cd.get("description") if isinstance(cd, dict) else None),
        )
        for name, cd in schema_raw.get("columns", {}).items()
    }
    return FileDefinition(
        path=raw["path"],
        format=raw.get("format", "csv"),
        file_schema=FileSchema(name=schema_raw.get("name", ""), columns=cols),
    )


def load_pipeline_config(path: str) -> PipelineConfig:
    """YAML → PipelineConfig (reference: app/main.py:337-358)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return PipelineConfig(
        inputs={k: _parse_file_definition(v) for k, v in raw.get("inputs", {}).items()},
        outputs={k: _parse_file_definition(v) for k, v in raw.get("outputs", {}).items()},
    )


def load_pipeline_flow(path: str) -> PipelineFlow:
    """YAML → PipelineFlow (reference: app/main.py:483-499)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return PipelineFlow(
        source=raw["source"],
        operations=[parse_operation(op) for op in raw.get("operations", [])],
    )


def save_pipeline_flow(flow: PipelineFlow, path: str) -> None:
    """PipelineFlow → YAML (reference: app/main.py:502-513)."""
    ops = []
    for op in flow.operations:
        d = {k: v for k, v in op.__dict__.items() if v is not None}
        d["operation_type"] = op.operation_type
        ops.append(d)
    with open(path, "w") as f:
        yaml.safe_dump({"source": flow.source, "operations": ops}, f, sort_keys=False)
