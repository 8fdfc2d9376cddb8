"""Continuous-aggregate ROLLUP STORE — the hypertable-style member of
the persisted-store family: HLL registers answer distinct counts
(functions/sketch.py), CMS counters frequencies (functions/cms.py),
KMV samples set operations (functions/kmv.py), the quantile store
order statistics (functions/quantile.py); this one answers plain
time-bucketed metric aggregates (count / sum / avg / min / max per
group per hour) WITHOUT re-scanning history — the TimescaleDB
continuous-aggregate / Druid rollup segment pattern, re-expressed as
parquet partials + an associative merge.

Determinism discipline (the repo standard — every number is either an
integer aggregate or a fixed, order-free fold):

- bucket index: ``FLOOR(epoch_seconds / grain)`` — timestamp→double is
  engine-independent epoch seconds (the proven events_window /
  gap_fill contract) and the floor of the scaled double is exact for
  any realistic epoch (|seconds| < 2^53);
- value sums: per-row quantization ``FLOOR(value · 2^20)`` (a
  power-of-two multiply is a bare exponent shift — exact), then BIGINT
  sums — associative and commutative, so ANY merge tree equals the
  single pass bit-for-bit.  Headroom: |value| < 2^23 keeps |q| < 2^43,
  leaving 2^20 rows per (group, bucket) before BIGINT could overflow —
  raise ``grain`` or lower ``q_bits`` for hotter buckets (ANSI mode
  turns a miss into a loud error, never a wrap);
- min/max: raw doubles — order-free by definition;
- the only floats produced are at SERVE time: ``sum_q / 2^20`` (one
  IEEE division) and ``(sum_q / 2^20) / n_vals`` (two, in a fixed
  tree) — bit-identical across engines.

Merge = ``GROUP BY (group, bucket): SUM / SUM / SUM / MIN / MAX`` —
plain integer/extremum re-aggregation, so appending each ingested
batch's partials and re-merging at read time is EXACTLY the
single-pass rollup over the union.  Like the CMS counter store (and
unlike MAX-merged HLL registers), SUM is NOT idempotent: re-appending
the same batch double-counts it — the store owner appends each batch
exactly once (generation-keyed overwrite directories give streaming
exactly-once; see streaming/events.py's sketch refresh).

Scale: refresh cost is one scan of the NEW batch plus ≤
|groups|·|buckets-touched| partial rows; serving any window is a scan
of bounded store rows, never history.  Coarser grains (day/week) are
served FROM the hour store by re-bucketing the partials
(:func:`rollup_coarsen`) — floor-division composition, no raw-data
re-scan — the multi-granularity serving story of a hypertable.

Reference parity note: the reference engine (app/operations/*) has no
persisted aggregate surface at all — this extends SURVEY §2's
aggregation operator family to the incremental/serving regime the
100 TB target needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_Q_BITS = 20
HOUR = 3600
DAY = 86400

#: the persisted state columns, in store order (group cols precede them)
STATE_COLS = ("bucket_idx", "n_rows", "n_vals", "sum_q", "min_v", "max_v")


def _q_scale(q_bits: int) -> float:
    if not 0 <= q_bits <= 40:
        raise ValueError(f"rollup q_bits must be in [0, 40], got {q_bits}")
    return float(1 << q_bits)


def _check_cols(group_cols: list[str]) -> None:
    clash = [c for c in group_cols if c in STATE_COLS]
    if clash:
        raise ValueError(f"rollup group columns collide with state columns: {clash}")


def rollup_build(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    *,
    grain: int = HOUR,
    q_bits: int = DEFAULT_Q_BITS,
) -> DataFrame:
    """One batch's aggregate partials: ``(group_cols..., bucket_idx
    long, n_rows long, n_vals long, sum_q long, min_v double,
    max_v double)``.

    ``n_rows`` counts every row in the bucket; ``n_vals``/``sum_q``
    skip NULL values (both engines' SUM/COUNT(col) semantics).  NULL
    timestamps and NULL group keys are dropped explicitly — the
    store's merge groupBy would otherwise emit NULL-key groups that a
    SQL oracle's equi-semantics can silently diverge on (the standard
    NULL-group trap)."""
    _check_cols(group_cols)
    scale = _q_scale(q_bits)
    bucket = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(float(grain))
    ).cast("long")
    not_null = F.col(ts_col).isNotNull()
    for g in group_cols:
        not_null = not_null & F.col(g).isNotNull()
    q = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    return (
        df.where(not_null)
        .groupBy(*group_cols, bucket.alias("bucket_idx"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(F.col(value_col)).cast("long").alias("n_vals"),
            F.sum(q).cast("long").alias("sum_q"),
            F.min(F.col(value_col)).alias("min_v"),
            F.max(F.col(value_col)).alias("max_v"),
        )
    )


def rollup_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-aggregate a partial table holding several appended
    generations — one row per (group, bucket) afterwards, EXACTLY the
    single-pass rollup (integer sums and extrema are associative and
    commutative).  Safe (no-op) on an already-merged table."""
    return partials.groupBy(*group_cols, "bucket_idx").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("n_vals").cast("long").alias("n_vals"),
        F.sum("sum_q").cast("long").alias("sum_q"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_coarsen(
    merged: DataFrame, group_cols: list[str], *, factor: int
) -> DataFrame:
    """Serve a COARSER grain from an existing store without touching
    raw data: re-bucket ``bucket_idx`` by ``FLOOR(bucket / factor)``
    (hour→day: factor 24) and re-merge.  The explicit double-division
    floor (not integer DIV, which truncates toward zero) makes the
    composition exact for negative pre-epoch buckets too, and is the
    literal expression the oracle mirrors."""
    if factor < 1:
        raise ValueError(f"rollup_coarsen factor must be >= 1, got {factor}")
    rebucketed = merged.withColumn(
        "bucket_idx",
        F.floor(F.col("bucket_idx") / F.lit(float(factor))).cast("long"),
    )
    return rollup_merge(rebucketed, group_cols)


def rollup_serve(
    merged: DataFrame, group_cols: list[str], *, q_bits: int = DEFAULT_Q_BITS
) -> DataFrame:
    """User-facing view of a merged store: adds ``sum_v`` (``sum_q /
    2^q_bits``, one IEEE division) and ``avg_v`` (``sum_v / n_vals``,
    a second division in a fixed tree) — the only floats the family
    produces, bit-identical across engines.  A bucket whose every
    value was NULL serves NULL sum/avg (NULL propagates through both
    divisions in both engines; ``n_vals`` is 0 only in that case, so
    the double division never sees a live 0 denominator)."""
    scale = _q_scale(q_bits)
    sum_v = F.col("sum_q").cast("double") / F.lit(scale)
    return merged.select(
        *group_cols,
        "bucket_idx",
        "n_rows",
        "n_vals",
        "sum_q",
        sum_v.alias("sum_v"),
        (sum_v / F.col("n_vals").cast("double")).alias("avg_v"),
        "min_v",
        "max_v",
    )


def build_rollup_store(
    df: DataFrame,
    path: str,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    *,
    grain: int = HOUR,
    q_bits: int = DEFAULT_Q_BITS,
    mode: str = "overwrite",
) -> None:
    """Persist one batch's partials (:func:`rollup_build`) as a
    parquet AGGREGATE STORE.  Append each ingested batch exactly once
    (``mode='append'``; SUM-merge is at-most-once — see module
    docstring); compact piled-up generations by rewriting the
    re-merged table with ``mode='overwrite'``."""
    rollup_build(
        df, ts_col, value_col, group_cols, grain=grain, q_bits=q_bits
    ).write.mode(mode).parquet(path)


def rollup_from_store(
    spark,
    store_path: str,
    group_cols: list[str],
    *,
    group_schema: str,
    batch: DataFrame | None = None,
    ts_col: str | None = None,
    value_col: str | None = None,
    grain: int = HOUR,
    q_bits: int = DEFAULT_Q_BITS,
) -> DataFrame:
    """Merged (group, bucket) aggregates from a persisted store,
    optionally folding a NEW batch's partials in the same pass (the
    serve-before-append read a streaming dashboard wants).
    ``group_schema`` is the DDL for the group columns (e.g.
    ``"event_type string"``) — cold-start reads of an empty store have
    no parquet footers to infer from."""
    _check_cols(group_cols)
    if batch is not None and (ts_col is None or value_col is None):
        raise ValueError("rollup_from_store: batch requires ts_col and value_col")
    schema = (
        f"{group_schema}, bucket_idx long, n_rows long, n_vals long, "
        "sum_q long, min_v double, max_v double"
    )
    partials = spark.read.schema(schema).parquet(store_path)
    if batch is not None:
        partials = partials.unionByName(
            rollup_build(batch, ts_col, value_col, group_cols, grain=grain, q_bits=q_bits)
        )
    return rollup_merge(partials, group_cols)


def rollup_spikes(
    merged: DataFrame,
    group_cols: list[str],
    *,
    factor_num: int = 2,
    factor_den: int = 1,
) -> DataFrame:
    """Traffic-spike buckets from a merged rollup: every (group,
    bucket) whose row count is at least ``factor_num/factor_den``
    times the group's MEAN bucket count — hot-hour / burst detection
    served entirely from rollup state, never raw data.

    Exactness discipline: the flag is the cross-multiplied INTEGER
    inequality ``n_rows · n_buckets · den >= num · total_rows`` (no
    division, no ties-at-rounding); the reported ``spike_ratio`` is
    one IEEE division of two exact integer products.  The per-group
    stats frame is ≤ |groups| rows and broadcasts — the comparison is
    map-side against the (already bounded) rollup state."""
    if factor_num < 1 or factor_den < 1:
        raise ValueError(
            f"rollup_spikes factors must be >= 1, got {factor_num}/{factor_den}"
        )
    from ..session import materialize

    # the rollup state is referenced twice (stats + join probe); it is
    # bounded (≤ |groups|·|buckets| rows), so materialize once instead
    # of re-running the corpus build on the stats branch
    merged = materialize(merged)
    stats = merged.groupBy(*group_cols).agg(
        F.sum("n_rows").cast("long").alias("__total__"),
        F.count(F.lit(1)).cast("long").alias("__nb__"),
    )
    joined = merged.join(F.broadcast(stats), list(group_cols))
    lhs = F.col("n_rows") * F.col("__nb__") * F.lit(int(factor_den))
    rhs = F.lit(int(factor_num)) * F.col("__total__")
    return (
        joined.where(lhs >= rhs)
        .select(
            *group_cols,
            "bucket_idx",
            "n_rows",
            (
                (F.col("n_rows") * F.col("__nb__")).cast("double")
                / F.col("__total__").cast("double")
            ).alias("spike_ratio"),
        )
    )


def rollup_spikes_oracle_sql(
    *,
    table: str,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    grain: int = HOUR,
    factor_num: int = 2,
    factor_den: int = 1,
) -> str:
    """DuckDB mirror of ``rollup_build → merge → rollup_spikes`` as a
    windowed single pass, generated from the same constants.  The
    bucketed CTE is the same GROUP BY the rollup oracle uses (only
    ``n_rows`` is consumed, so the value aggregates are elided)."""
    if factor_num < 1 or factor_den < 1:
        raise ValueError(
            f"rollup_spikes factors must be >= 1, got {factor_num}/{factor_den}"
        )
    gsel = ", ".join(group_cols)
    part = ", ".join(group_cols)
    nn = " AND ".join(
        [f"{ts_col} IS NOT NULL"] + [f"{g} IS NOT NULL" for g in group_cols]
    )
    bucket = f"CAST(FLOOR(epoch({ts_col}) / {float(grain)!r}) AS BIGINT)"
    return f"""
WITH __rs_g AS (
  SELECT {gsel}, {bucket} AS bucket_idx, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM {table}
  WHERE {nn}
  GROUP BY ALL
), __rs_s AS (
  SELECT *,
         CAST(SUM(n_rows) OVER (PARTITION BY {part}) AS BIGINT) AS total_rows,
         CAST(COUNT(*) OVER (PARTITION BY {part}) AS BIGINT) AS n_buckets
  FROM __rs_g
)
SELECT {gsel}, bucket_idx, n_rows,
       CAST(n_rows * n_buckets AS DOUBLE) / CAST(total_rows AS DOUBLE)
         AS spike_ratio
FROM __rs_s
WHERE n_rows * n_buckets * {int(factor_den)} >= {int(factor_num)} * total_rows
"""


def rollup_oracle_sql(
    *,
    table: str,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    grain: int = HOUR,
    q_bits: int = DEFAULT_Q_BITS,
    coarsen_factor: int | None = None,
) -> str:
    """DuckDB mirror of ``rollup_build → [coarsen] → merge → serve``
    as ONE single-pass GROUP BY, generated from the same constants
    (grain, q_bits, the coarsen expression) so the two cannot drift —
    equality against the multi-append store read IS the proof that the
    merge is lossless.  ``coarsen_factor`` mirrors
    :func:`rollup_coarsen`'s nested-floor composition literally
    (``FLOOR(FLOOR(epoch/grain) / factor)``), not an equivalent
    single division — drift-proofing over elegance."""
    scale = int(_q_scale(q_bits))
    gsel = ", ".join(group_cols)
    nn = " AND ".join(
        [f"{ts_col} IS NOT NULL"] + [f"{g} IS NOT NULL" for g in group_cols]
    )
    bucket = f"CAST(FLOOR(epoch({ts_col}) / {float(grain)!r}) AS BIGINT)"
    if coarsen_factor is not None:
        bucket = f"CAST(FLOOR({bucket} / {float(coarsen_factor)!r}) AS BIGINT)"
    return f"""
WITH __ru_g AS (
  SELECT {gsel},
         {bucket} AS bucket_idx,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT({value_col}) AS BIGINT) AS n_vals,
         CAST(SUM(CAST(FLOOR({value_col} * {float(scale)!r}) AS BIGINT)) AS BIGINT)
           AS sum_q,
         MIN({value_col}) AS min_v,
         MAX({value_col}) AS max_v
  FROM {table}
  WHERE {nn}
  GROUP BY ALL
)
SELECT {gsel}, bucket_idx, n_rows, n_vals, sum_q,
       CAST(sum_q AS DOUBLE) / {float(scale)!r} AS sum_v,
       (CAST(sum_q AS DOUBLE) / {float(scale)!r}) / CAST(n_vals AS DOUBLE) AS avg_v,
       min_v, max_v
FROM __ru_g
"""
