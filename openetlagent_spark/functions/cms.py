"""Deterministic count-min sketch — bounded-state frequency estimation
with an exactly-checkable oracle.

The companion to functions/sketch.py's HLL: where HLL answers "how
many distinct keys", count-min answers "how often does key x occur"
with state bounded by d·w counters instead of the full key domain.
At 100 TB the exact per-key count is a full shuffle of every key;
the sketch reduces map-side to d·w partial sums (one integer per
(row, bucket)), shuffles at most d·w rows, and answers point queries
by broadcasting the tiny counter table.

Determinism / exactness: the d hash rows are the engine-portable
md5-prefix fold with a per-row suffix (the same construction as
functions/bloom.py positions), counters are exact BIGINT sums, and
the point estimate min(counter_1..d) is integer — so the entire
sketch, overestimates included, hash-matches a generated DuckDB
oracle.  Count-min never underestimates: est >= true count always,
with P[est > true + eps·N] bounded by the standard (e/w)^d analysis.

Scale notes:
- build: one groupBy (row, bucket) over the exploded d-row stream —
  map-side partial sums do nearly all the work; the shuffled relation
  is <= d·w rows regardless of input size.
- serve: the counter table is <= d·w rows — broadcast-joined (or
  plan-literal for small w) against any probe set with zero shuffle
  of the probe side beyond the build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CMS_W = 1024  # counters per hash row
DEFAULT_CMS_D = 3  # hash rows


def cms_bucket(col, row: int, w: int):
    """Bucket of ``col`` in hash row ``row``: md5-prefix fold of the
    value with a per-row suffix, mod w.  NULL in -> NULL out."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"#c{row}"))), 1, 8),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> DataFrame:
    """Counter table (hash_row, bucket, cnt) over ``df[key_col]`` —
    at most d·w rows, built in ONE shuffle with map-side partial sums.
    NULL keys are skipped (they can never be probed)."""
    if w < 2 or d < 1:
        raise ValueError(f"cms needs w >= 2 and d >= 1, got w={w} d={d}")
    rows = df.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_row"),
                        cms_bucket(F.col(key_col), i, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.hash_row").alias("hash_row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    counters: DataFrame,
    key_col: str,
    *,
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-query the sketch for every probe row: est = MIN over the
    d (row, bucket) counters the key hashes to (0 if a counter row is
    absent — an empty bucket).  The counter table broadcasts; the
    probe side never shuffles at its own width (one shuffle of the
    (probe-key, d) expansion for the min-aggregate)."""
    expanded = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_row"),
                        cms_bucket(F.col(key_col), i, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.hash_row", "rb.bucket")
    joined = expanded.join(
        F.broadcast(counters), ["hash_row", "bucket"], "left"
    ).select(key_col, F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("c"))
    return joined.groupBy(key_col).agg(F.min("c").alias(out_col))


def build_cms_store(
    df: DataFrame,
    path: str,
    key_col: str,
    *,
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
    mode: str = "overwrite",
) -> None:
    """Persist the counter table (:func:`cms_build`) as a parquet
    COUNTER STORE — the frequency sibling of sketch.build_hll_store.
    Count-min counters merge by plain SUM per (hash_row, bucket), so
    appending each ingested batch's ≤ d·w counter rows
    (``mode='append'``) and re-SUMming at read time
    (:func:`cms_from_store`) is EXACTLY the single-pass sketch over the
    union — deterministic md5 buckets, associative/commutative integer
    addition.  (Unlike MAX-merged HLL registers, SUM is NOT idempotent:
    re-appending the same batch double-counts it — the store owner must
    append each batch exactly once, the same at-most-once contract as
    any counter.)  Compact piled-up generations by rewriting the
    re-SUMmed table with ``mode='overwrite'``."""
    cms_build(df, key_col, w=w, d=d).write.mode(mode).parquet(path)


def cms_merge_counters(counters: DataFrame) -> DataFrame:
    """Re-SUM a counter table holding several appended generations —
    one row per (hash_row, bucket) afterwards.  Safe (no-op) on an
    already-merged table."""
    return counters.groupBy("hash_row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_from_store(
    spark,
    store_path: str,
    *,
    batch: DataFrame | None = None,
    key_col: str | None = None,
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> DataFrame:
    """Merged counter table from a persisted store, optionally folding
    a NEW batch's counters in the same pass.  Cold-start (empty store)
    reads use the explicit counter schema — zero part files have no
    footers to infer from."""
    regs = spark.read.schema("hash_row int, bucket long, cnt long").parquet(
        store_path
    )
    if batch is not None:
        if key_col is None:
            raise ValueError("cms_from_store: batch requires key_col")
        regs = regs.unionByName(cms_build(batch, key_col, w=w, d=d))
    return cms_merge_counters(regs)


def cms_oracle_sql(
    *,
    table: str,
    key_col: str,
    probe_sql: str,
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> str:
    """DuckDB mirror of cms_build + cms_estimate, generated from the
    same constants.  ``probe_sql`` yields one column named ``key_col``
    (non-null, distinct)."""

    def bucket(expr: str, i: int) -> str:
        return (
            f"(('0x' || substr(md5(CAST({expr} AS VARCHAR) || '#c{i}'), 1, 8))::BIGINT"
            f" % {w})"
        )

    build_rows = " UNION ALL ".join(
        f"SELECT {i} AS hash_row, {bucket(key_col, i)} AS bucket"
        f" FROM {table} WHERE {key_col} IS NOT NULL"
        for i in range(d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS hash_row, {bucket(key_col, i)} AS bucket"
        f" FROM __cms_probes"
        for i in range(d)
    )
    return f"""
WITH __cms_counters AS (
  SELECT hash_row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({build_rows}) GROUP BY 1, 2
), __cms_probes AS ({probe_sql}),
__cms_exp AS ({probe_rows})
SELECT p.{key_col}, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
FROM __cms_exp p
LEFT JOIN __cms_counters c ON p.hash_row = c.hash_row AND p.bucket = c.bucket
GROUP BY p.{key_col}
"""
