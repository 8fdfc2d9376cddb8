"""Range (interval) joins without a cross join.

Spark compiles an inequality-only join condition to a broadcast nested
loop / cartesian product — quadratic and unusable at scale.  The
standard fix is BUCKETED EXPANSION: quantize the time axis into
buckets of width ≥ the tolerance window, explode one side into its
bucket and the adjacent bucket(s), equi-join on (key, bucket) — a
plain hash shuffle — and apply the exact range predicate as a post-
filter.  Every true pair shares a bucket after expansion, so the
result is exact; the expansion factor is a small constant (3 for a
symmetric window).

Provided shapes:
- within_tolerance_pairs: self-join — pairs of rows with the same key
  whose times differ by at most ``tolerance`` seconds.
- point_in_interval_join: left points joined to right [start, end]
  intervals sharing a key; intervals explode into each bucket they
  overlap (capped by ``max_interval_buckets`` — refuse pathological
  intervals loudly rather than exploding quadratically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _time_double(df: DataFrame, col_name: str) -> Column:
    dtype = dict(df.dtypes)[col_name]
    col = F.col(col_name)
    if dtype.startswith("timestamp"):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def within_tolerance_pairs(
    df: DataFrame,
    *,
    key: str,
    time_col: str,
    id_col: str,
    tolerance: float,
) -> DataFrame:
    """Pairs (id_a < id_b) sharing ``key`` with |t_a - t_b| <= tolerance
    seconds.  Plan: bucket by floor(t/tolerance); side A expands into
    {bucket-1, bucket, bucket+1}; equi-join on (key, bucket); exact
    filter.  One shuffle on (key, bucket)."""
    base = df.select(
        F.col(key).alias("__k__"),
        F.col(id_col).alias("__id__"),
        _time_double(df, time_col).alias("__t__"),
    ).withColumn("__bucket__", F.floor(F.col("__t__") / F.lit(tolerance)).cast("long"))

    expanded = base.withColumn(
        "__bucket__", F.explode(F.array(F.col("__bucket__") - 1, F.col("__bucket__"), F.col("__bucket__") + 1))
    ).select("__k__", "__bucket__", F.col("__id__").alias("id_a"), F.col("__t__").alias("t_a"))

    right = base.select("__k__", "__bucket__", F.col("__id__").alias("id_b"), F.col("__t__").alias("t_b"))

    return (
        expanded.join(right, ["__k__", "__bucket__"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("t_a") - F.col("t_b")) <= F.lit(float(tolerance)))
        )
        .select(F.col("__k__").alias(key), "id_a", "id_b",
                (F.abs(F.col("t_a") - F.col("t_b"))).alias("dt_seconds"))
        .dropDuplicates(["id_a", "id_b"])
    )


def _time_micros(df: DataFrame, col_name: str) -> Column:
    """Epoch MICROSECONDS as BIGINT — the integer time axis the overlap
    join computes on (integer bucket/compare/subtract math is bit-exact
    across engines; Spark unix_micros == DuckDB epoch_us, the proven
    unix_millis/epoch_ms pair at µs precision).  Numeric columns are
    treated as seconds and scaled."""
    dtype = dict(df.dtypes)[col_name]
    col = F.col(col_name)
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    return (col.cast("double") * F.lit(1_000_000.0)).cast("long")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_id: str,
    right_id: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width_seconds: float = 3600.0,
    max_interval_buckets: int = 10_000,
) -> DataFrame:
    """Interval × interval OVERLAP join — each same-``key`` pair whose
    ranges intersect (``l_start ≤ r_end AND r_start ≤ l_end``), with the
    exact overlap length: (key, left_id, right_id, overlap_us).  The
    missing sibling of point_in_interval_join (sessions × incidents,
    shipping windows × promotions, shifts × outages).

    Plan shape — never a cross join, never a dedup shuffle:

    1. both sides explode into every bucket their interval spans
       (span-capped like point_in_interval_join — degenerate intervals
       refuse loudly);
    2. ONE equi-shuffle on (key, bucket);
    3. exact overlap post-filter, PLUS the canonical-bucket condition
       ``bucket == greatest(l_start, r_start) DIV width``: a true pair
       shares every bucket between the later start and the earlier end,
       but the later start lies inside BOTH intervals (that is what
       overlap means), so exactly one joined copy survives — no
       dropDuplicates pass, the result is distinct by construction.

    All time math is integer microseconds (_time_micros), so bucket
    ids, the overlap predicate, and ``overlap_us`` are bit-exact in any
    engine.  NULL keys/bounds are excluded (SQL join semantics)."""
    width_us = int(bucket_width_seconds * 1_000_000)
    if width_us <= 0:
        # guard the TRUNCATED integer width, not the float input: a
        # sub-microsecond width would truncate to 0 and silently empty
        # the result (NULL division -> NULL span -> explode drops all)
        raise ValueError(
            "interval_overlap_join: bucket_width_seconds must be >= 1e-6 "
            f"(one microsecond), got {bucket_width_seconds!r}"
        )

    def prep(df: DataFrame, id_col: str, s_col: str, e_col: str, tag: str) -> DataFrame:
        s = _time_micros(df, s_col)
        e = _time_micros(df, e_col)
        out = df.select(
            F.col(key).alias("__k__"),
            F.col(id_col).alias(f"__id_{tag}__"),
            s.alias(f"__s_{tag}__"),
            e.alias(f"__e_{tag}__"),
        ).filter(
            F.col("__k__").isNotNull()
            & F.col(f"__s_{tag}__").isNotNull()
            & F.col(f"__e_{tag}__").isNotNull()
            & (F.col(f"__s_{tag}__") <= F.col(f"__e_{tag}__"))
        )
        span = (
            F.floor(F.col(f"__e_{tag}__") / F.lit(width_us))
            - F.floor(F.col(f"__s_{tag}__") / F.lit(width_us))
        ).cast("long")
        out = out.withColumn("__span__", span)
        out = out.withColumn(
            "__span__",
            F.when(
                F.col("__span__") > max_interval_buckets,
                F.raise_error(
                    F.concat(
                        F.lit("interval_overlap_join: interval spans more than "),
                        F.lit(str(max_interval_buckets)),
                        F.lit(" buckets; raise bucket_width_seconds"),
                    )
                ).cast("long"),
            ).otherwise(F.col("__span__")),
        )
        return out.withColumn(
            "__b__",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__span__")),
                    lambda i: F.floor(F.col(f"__s_{tag}__") / F.lit(width_us)).cast(
                        "long"
                    )
                    + i,
                )
            ),
        ).drop("__span__")

    lf = prep(left, left_id, left_start, left_end, "l")
    rf = prep(right, right_id, right_start, right_end, "r")
    later_start = F.greatest(F.col("__s_l__"), F.col("__s_r__"))
    return (
        lf.join(rf, ["__k__", "__b__"])
        .filter(
            (F.col("__s_l__") <= F.col("__e_r__"))
            & (F.col("__s_r__") <= F.col("__e_l__"))
            # canonical bucket: the one containing the later start —
            # spanned by both sides, so each true pair joins exactly once
            & (F.col("__b__") == F.floor(later_start / F.lit(width_us)).cast("long"))
        )
        .select(
            F.col("__k__").alias(key),
            F.col("__id_l__").alias(left_id),
            F.col("__id_r__").alias(right_id),
            (
                F.least(F.col("__e_l__"), F.col("__e_r__")) - later_start
            ).alias("overlap_us"),
        )
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    left_on: str,
    right_on: str,
    time_col: str,
    start_col: str,
    end_col: str,
    value_columns: list[str],
    bucket_width: float = 3600.0,
    max_interval_buckets: int = 10_000,
) -> DataFrame:
    """Inner join: each left point row matched to every right interval
    (same key) with start <= t <= end.  Intervals explode into the
    buckets they span; degenerate intervals spanning more than
    ``max_interval_buckets`` buckets raise instead of exploding."""
    p = points.withColumn("__t__", _time_double(points, time_col)).withColumn(
        "__bucket__", F.floor(F.col("__t__") / F.lit(bucket_width)).cast("long")
    )
    iv = (
        intervals.withColumn("__s__", _time_double(intervals, start_col))
        .withColumn("__e__", _time_double(intervals, end_col))
    )
    span = (F.floor(F.col("__e__") / F.lit(bucket_width)) - F.floor(F.col("__s__") / F.lit(bucket_width))).cast("long")
    iv = iv.withColumn("__span__", span)
    # Loud refusal on pathological intervals (cf. MAX_PIVOT_KEYS).
    iv = iv.withColumn(
        "__span__",
        F.when(
            F.col("__span__") > max_interval_buckets,
            F.raise_error(
                F.concat(
                    F.lit("point_in_interval_join: interval spans more than "),
                    F.lit(str(max_interval_buckets)),
                    F.lit(" buckets; raise bucket_width"),
                )
            ).cast("long"),
        ).otherwise(F.col("__span__")),
    )
    iv = iv.withColumn(
        "__bucket__",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("__span__")),
                lambda i: F.floor(F.col("__s__") / F.lit(bucket_width)).cast("long") + i,
            )
        ),
    )

    right = iv.select(
        F.col(right_on).alias("__rk__"),
        F.col("__bucket__").alias("__rbucket__"),
        "__s__",
        "__e__",
        *[F.col(c) for c in value_columns],
    )
    joined = p.join(
        right,
        (F.col(left_on) == F.col("__rk__")) & (F.col("__bucket__") == F.col("__rbucket__")),
    )
    return (
        joined.filter((F.col("__t__") >= F.col("__s__")) & (F.col("__t__") <= F.col("__e__")))
        .drop("__rk__", "__rbucket__", "__bucket__", "__s__", "__e__", "__t__")
    )
