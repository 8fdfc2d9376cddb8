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
    (probe-key, d) expansion for the min-aggregate).

    NULL probe keys are excluded up front (mirroring cms_build's
    isNotNull): a NULL key would miss every counter join and coalesce
    into est=0, which reads as "seen zero times" rather than
    "unknown key"."""
    probes = probes.where(F.col(key_col).isNotNull())
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


def cms_heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    *,
    threshold: int,
    w: int = 256,
    d: int = DEFAULT_CMS_D,
    count_col: str = "cnt",
) -> DataFrame:
    """EXACT heavy hitters with a CMS prefilter: every group whose
    row count is >= ``threshold``, found WITHOUT shuffling the rows of
    groups that cannot qualify.

    Two passes over ``df`` (the canonical two-pass heavy-hitter shape
    — re-scanning beats shuffling every key when keys are wide):

    1. build the d·w counter table (:func:`cms_build` — the shuffle
       carries <= d·w integer rows regardless of input size), collect
       it (bounded driver state, like the Bloom bitmap), and embed it
       as d array literals in the plan;
    2. filter MAP-SIDE: each row's estimate is ``LEAST`` over d
       ``element_at`` lookups into the embedded arrays — pure
       whole-stage-codegen expressions, no join, no broadcast
       exchange (the functions/bloom.py gate pattern).  Count-min
       never underestimates, so ``est >= threshold`` keeps every true
       heavy hitter: the filter is LOSSLESS, and rows of light groups
       never reach the final shuffle;
    3. exact GROUP BY over the survivors (heavy groups plus collision
       stragglers), ``HAVING count >= threshold``.

    The oracle is the plain one-pass GROUP BY .. HAVING — equality IS
    the losslessness proof, the same contract as qsketch_prefilter.

    Multi-column groups hash on a ``':'``-joined string render; a
    separator collision between two groups only MERGES their counters
    (overestimates further), never underestimates — the exact pass
    groups on the real columns, so correctness is unaffected.  NULL
    group keys are dropped explicitly (mirrored in the oracle WHERE).
    """
    if threshold < 1:
        raise ValueError(f"heavy_hitters threshold must be >= 1, got {threshold}")
    if not group_cols:
        raise ValueError("heavy_hitters needs at least one group column")
    if count_col in group_cols:
        raise ValueError(f"count_col {count_col!r} collides with a group column")
    if w * d > 8192:
        raise ValueError(
            f"plan-literal counter table too large (w*d={w * d} > 8192); "
            "lower w/d or probe via cms_estimate's broadcast join instead"
        )
    from .bloom import long_array_lit

    not_null = F.lit(True)
    for g in group_cols:
        not_null = not_null & F.col(g).isNotNull()
    key = F.concat_ws(":", *[F.col(g).cast("string") for g in group_cols])
    keyed = df.where(not_null).withColumn("__hh_key__", key)

    counters = cms_build(keyed, "__hh_key__", w=w, d=d).collect()  # <= d*w rows
    table = [[0] * w for _ in range(d)]
    for r in counters:
        table[r["hash_row"]][r["bucket"]] = r["cnt"]
    lookups = [
        F.element_at(
            long_array_lit(table[i]),
            (cms_bucket(F.col("__hh_key__"), i, w) + 1).cast("int"),
        )
        for i in range(d)
    ]
    est = lookups[0] if d == 1 else F.least(*lookups)
    survivors = keyed.where(est >= F.lit(int(threshold)))
    return (
        survivors.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("long").alias(count_col))
        .where(F.col(count_col) >= F.lit(int(threshold)))
    )


def heavy_hitters_oracle_sql(
    *,
    table: str,
    group_cols: list[str],
    threshold: int,
    count_col: str = "cnt",
) -> str:
    """DuckDB mirror of :func:`cms_heavy_hitters` — deliberately the
    sketch-free single-pass GROUP BY .. HAVING, because the CMS
    prefilter is claimed LOSSLESS: hash-equality against this oracle
    is that claim as a tested fact."""
    gsel = ", ".join(group_cols)
    nn = " AND ".join(f"{g} IS NOT NULL" for g in group_cols)
    return f"""
SELECT {gsel}, CAST(COUNT(*) AS BIGINT) AS {count_col}
FROM {table}
WHERE {nn}
GROUP BY ALL
HAVING COUNT(*) >= {int(threshold)}
"""


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
