"""Time-series gap filling: dense per-key grid + forward fill.

The reference engine (Antix5/OpenETLAgent) has no time-series
vocabulary; this extends the engine the same way the window/asof
families do (SURVEY §2 extension surface).  ``gap_fill_hourly``
produces the classic "resample to an hourly grid and carry the last
observation forward" shape every metrics / feature-store pipeline
needs: per key, every hour between the key's first and last
observation exists exactly once, observed hours keep their aggregate,
gap hours inherit the most recent earlier value.

Exactly oracle-checkable end to end:
- the hour index is integer ``FLOOR(epoch_seconds / 3600)`` (both
  engines agree bit-for-bit on timestamp→double→floor),
- the per-hour aggregate uses the proven DECIMAL-accumulate→DOUBLE
  contract shared with the windowed event counts,
- Spark ``sequence(h0, h1)`` and DuckDB ``generate_series(h0, h1)``
  are both inclusive on BIGINT,
- Spark ``last(x, ignorenulls=True)`` over ROWS UNBOUNDED
  PRECEDING..CURRENT == DuckDB ``last_value(x IGNORE NULLS)`` with the
  same frame: both carry values untouched, so doubles stay
  bit-identical.

Scale notes (100 TB):
- The raw table is reduced FIRST: one shuffle to (key, hour) partial
  aggregates (map-side combine does most of the work), so the grid /
  fill stages only ever see |keys| x |hours| rows — at most a few
  thousand per key per year — never raw events.
- The grid explode is per-key ``sequence(min, max)``; a corrupt key
  whose span would explode the grid fails LOUDLY via a raise_error
  guard (``max_span_hours``) instead of OOM-ing an executor.
- The forward fill is one window per key partition — Spark evaluates
  it in a single sorted pass per partition; no global sort, no
  single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# One year of hourly slots; a span larger than this in a single key is
# almost certainly a data error (epoch-0 sentinel rows etc.) and would
# quadratically inflate the grid — fail loudly, don't OOM.
DEFAULT_MAX_SPAN_HOURS = 24 * 366


def hour_index(ts_col) -> F.Column:
    """Integer hour bucket of a timestamp column: FLOOR(epoch/3600).

    timestamp→double is engine-independent epoch seconds (the proven
    events_window contract); floor of the scaled double is exact for
    any realistic epoch (|seconds| < 2^53)."""
    return F.floor(ts_col.cast("timestamp").cast("double") / F.lit(3600.0)).cast(
        "long"
    )


def gap_fill_hourly(
    df: DataFrame,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    max_span_hours: int = DEFAULT_MAX_SPAN_HOURS,
) -> DataFrame:
    """Hourly resample of ``df`` per ``key`` with forward fill.

    Output columns: ``key``, ``hour_idx``, ``n_events`` (0 on gap
    hours), ``observed`` (1/0), ``filled_sum`` (per-hour DOUBLE sum of
    ``value_col``, last observation carried forward across gaps).

    NULL keys are dropped explicitly (Spark's groupBy would emit a
    NULL-key group but the grid join could never match it — the
    standard NULL-group trap)."""
    hour = hour_index(F.col(ts_col))
    hourly = (
        df.where(F.col(key).isNotNull())
        .groupBy(F.col(key), hour.alias("hour_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL accumulate -> DOUBLE: deterministic, order-free,
            # and equal to the oracle's VARCHAR-routed decimal sum.
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    bounds = hourly.groupBy(key).agg(
        F.min("hour_idx").alias("__h0__"), F.max("hour_idx").alias("__h1__")
    )
    # NULL-safe: a key whose every ts is NULL has NULL bounds; sequence
    # (NULL, NULL) -> NULL -> explode drops it (DuckDB's generate_series
    # does the same), so the guard must not fire on the NULL branch.
    # "exceeds": a span of exactly max_span_hours is still allowed.
    span_ok = (
        (F.col("__h1__") - F.col("__h0__")) <= F.lit(int(max_span_hours))
    ) | F.col("__h1__").isNull()
    grid = bounds.select(
        F.col(key),
        F.explode(
            F.when(span_ok, F.sequence(F.col("__h0__"), F.col("__h1__"))).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"gap_fill_hourly: key span exceeds {int(max_span_hours)}"
                            " hours (corrupt timestamps?): key="
                        ),
                        F.col(key).cast("string"),
                    )
                )
            )
        ).alias("hour_idx"),
    )
    filled = grid.join(hourly, [key, "hour_idx"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col(key),
        F.col("hour_idx"),
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        F.when(F.col("n_events").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "observed"
        ),
        F.last(F.col("sum_value"), ignorenulls=True).over(w).alias("filled_sum"),
    )


def gap_fill_oracle_sql(
    *, table: str, key: str, ts_col: str, value_col: str
) -> str:
    """DuckDB SQL equivalent of gap_fill_hourly, generated from the
    same column names so the two cannot drift.  The guard branch is
    oracle-irrelevant (it raises instead of producing rows)."""
    return f"""
WITH hourly AS (
  SELECT {key},
         CAST(FLOOR(epoch({ts_col}) / 3600.0) AS BIGINT) AS hour_idx,
         COUNT(*) AS n_events,
         CAST(CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
  FROM {table}
  WHERE {key} IS NOT NULL
  GROUP BY 1, 2
), bounds AS (
  SELECT {key}, MIN(hour_idx) AS h0, MAX(hour_idx) AS h1 FROM hourly GROUP BY 1
), grid AS (
  SELECT {key}, unnest(generate_series(h0, h1)) AS hour_idx FROM bounds
)
SELECT g.{key}, g.hour_idx,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       CASE WHEN h.n_events IS NULL THEN 0 ELSE 1 END AS observed,
       last_value(h.sum_value IGNORE NULLS) OVER (
         PARTITION BY g.{key} ORDER BY g.hour_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
FROM grid g
LEFT JOIN hourly h ON g.{key} = h.{key} AND g.hour_idx = h.hour_idx
"""
