"""KMV (k-minimum-values) distinct sketch with SET-OPERATION
estimates — the theta-sketch-style member of the sketch family:
HLL (functions/sketch.py) answers per-group distinct counts, CMS
(functions/cms.py) frequencies, the quantile sketch
(functions/quantile.py) order statistics; this one answers
"how many distinct keys do sets A and B share / cover together?"
without ever shuffling the full key sets — the source-overlap /
audience-intersection diagnostic at 100 TB (cf. the Theta sketch
family, Dasgupta et al.; the same bottom-k construction as
Bar-Yossef et al.'s KMV distinct estimator).

Determinism discipline (the repo standard): keys hash to the 52-bit
md5 prefix (suffix ``'#kmv'`` decorrelates from the engine's other
md5 folds) — an exactly-representable BIGINT; per set, the k SMALLEST
distinct hashes survive (arrival-order- and partition-independent);
every estimate is INTEGER arithmetic on those hashes:

- cardinality: exact count n when n < k (the sample IS the set's hash
  image), else ``T DIV h_k`` with ``T = (k-1)·2^52`` precomputed in
  Python and embedded as one literal in BOTH plans (no overflow, no
  runtime float) and ``h_k`` the kth smallest hash;
- union(A, B): the same estimator on the bottom-k of the MERGED
  samples — valid because bottomk(A ∪ B) = bottomk(bottomk(A) ∪
  bottomk(B)) (the KMV property the quantile store also relies on);
- intersection: ``|K ∩ A_k ∩ B_k| · union_est DIV k`` where K is the
  union's kept set (the standard KMV/theta intersection estimator),
  degrading to the EXACT hash-intersection count when the union kept
  fewer than k (both sets fully sampled);
- jaccard: the one double in the output — ``matches / kept`` (single
  IEEE division of two exact integers, bit-identical across engines).

Scale: the only corpus-wide work is one distinct + bottom-k window on
a narrow (set, hash) stream; everything pairwise runs on ≤ |sets|·k
sample rows.  |sets| is assumed small (sources, languages, shards) —
the |sets|² pair fan-out is over k-row samples, never the corpus.

Requires k ≤ 2048 so T = (k-1)·2^52 stays inside BIGINT
((2047)·2^52 = 2^63 − 2^52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SUFFIX = "#kmv"
_HASH_BITS = 52


def _kmv_hash_col(key_col: str):
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(_HASH_SUFFIX))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")


def _kmv_hash_sql(key_col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR) || "
        f"'{_HASH_SUFFIX}'), 1, 13)) AS BIGINT)"
    )


def _check_k(k: int) -> int:
    if not 1 <= k <= 2048:
        raise ValueError(f"kmv k must be in [1, 2048], got {k}")
    return (k - 1) << _HASH_BITS  # T, the estimator numerator literal


def _bottom_k_distinct(rows: DataFrame, set_col: str, k: int) -> DataFrame:
    """The KMV sample discipline, in ONE place for both the fresh
    build and the store read: DISTINCT (set, hash) rows, k smallest
    hashes per set (ties impossible — hashes are distinct by
    construction after the DISTINCT)."""
    w = Window.partitionBy(set_col).orderBy(F.col("__h__").asc())
    return (
        rows.distinct()
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def kmv_sample(df: DataFrame, key_col: str, set_col: str, *, k: int = 1024) -> DataFrame:
    """Per-set bottom-k DISTINCT hash sample: ``(set_col, __h__)``.
    NULL keys and NULL set labels are skipped.  This is the mergeable
    state — persist/append it like the other sketch stores; re-taking
    the bottom-k after any union is lossless (KMV property)."""
    _check_k(k)
    return _bottom_k_distinct(
        df.where(F.col(key_col).isNotNull() & F.col(set_col).isNotNull())
        .select(F.col(set_col), _kmv_hash_col(key_col).alias("__h__")),
        set_col,
        k,
    )


def kmv_cardinality(sample: DataFrame, set_col: str, *, k: int = 1024) -> DataFrame:
    """Distinct-count estimates from a sample: one row per set —
    ``(set_col, n_sample bigint, kmv_est bigint)``.  Exact when the
    set had fewer than k distinct keys."""
    t = _check_k(k)
    agg = sample.groupBy(set_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.max("__h__").alias("__hk__"),
    )
    return agg.select(
        set_col,
        "n_sample",
        F.when(F.col("n_sample") < k, F.col("n_sample"))
        .otherwise(F.expr(f"{t}L DIV GREATEST(__hk__, 1L)"))
        .cast("long")
        .alias("kmv_est"),
    )


def kmv_set_ops(sample: DataFrame, set_col: str, *, k: int = 1024) -> DataFrame:
    """Pairwise set-operation estimates over every unordered pair of
    sets in the sample: ``(set_a, set_b, n_union_kept bigint,
    n_match bigint, union_est bigint, intersect_est bigint,
    jaccard double)``.

    Per pair: merge the two bottom-k samples, keep the k smallest
    distinct hashes (= the union's own KMV sample), count how many of
    those appear in BOTH sides (``n_match``), and scale:
    ``union_est`` by the KMV estimator (exact when fewer than k kept),
    ``intersect_est = n_match·union_est DIV n_union_kept``.  All
    integer except the final jaccard ratio.

    The sample frame is referenced three times (set list + both join
    sides) — it goes through the engine's materialize() boundary once
    so the corpus-wide distinct/bottom-k pass runs ONCE, not per
    reference (the sample is ≤ |sets|·k rows, kilobytes)."""
    t = _check_k(k)
    from ..session import materialize

    sample = materialize(sample)
    sets = sample.select(set_col).distinct()
    pairs = (
        sets.alias("pa")
        .crossJoin(sets.alias("pb"))
        .where(F.expr(f"pa.{set_col} < pb.{set_col}"))
        .select(
            F.col(f"pa.{set_col}").alias("set_a"),
            F.col(f"pb.{set_col}").alias("set_b"),
        )
    )
    # (pair, hash, membership-side bitmask aggregated): the sample is
    # tiny (≤ |sets|·k rows) so the pair fan-out joins stay bounded
    sa = sample.select(F.col(set_col).alias("set_a"), F.col("__h__"))
    sb = sample.select(F.col(set_col).alias("set_b"), F.col("__h__"))
    left = pairs.join(sa, "set_a").select("set_a", "set_b", "__h__", F.lit(1).alias("__in_a__"), F.lit(0).alias("__in_b__"))
    right = pairs.join(sb, "set_b").select("set_a", "set_b", "__h__", F.lit(0).alias("__in_a__"), F.lit(1).alias("__in_b__"))
    merged = (
        left.unionByName(right)
        .groupBy("set_a", "set_b", "__h__")
        .agg(
            F.max("__in_a__").alias("__a__"),
            F.max("__in_b__").alias("__b__"),
        )
    )
    w = Window.partitionBy("set_a", "set_b").orderBy(F.col("__h__").asc())
    kept = merged.withColumn("__rn__", F.row_number().over(w)).where(
        F.col("__rn__") <= k
    )
    agg = kept.groupBy("set_a", "set_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_kept"),
        F.max("__h__").alias("__hk__"),
        F.sum((F.col("__a__") * F.col("__b__")).cast("long")).alias("n_match"),
    )
    union_est = (
        F.when(F.col("n_union_kept") < k, F.col("n_union_kept"))
        .otherwise(F.expr(f"{t}L DIV GREATEST(__hk__, 1L)"))
        .cast("long")
    )
    # union_est lands in its own select first: referencing a same-select
    # alias from F.expr leans on implicit lateral-column-alias
    # resolution, which is a configurable Spark feature
    # (spark.sql.lateralColumnAlias.enableImplicitResolution) — an
    # intermediate projection works on every configuration
    with_union = agg.select(
        "set_a", "set_b", "n_union_kept", "n_match",
        union_est.alias("union_est"),
    )
    return with_union.select(
        "set_a",
        "set_b",
        "n_union_kept",
        "n_match",
        "union_est",
        F.expr("CAST(n_match AS BIGINT) * union_est DIV n_union_kept")
        .cast("long")
        .alias("intersect_est"),
        (
            F.col("n_match").cast("double") / F.col("n_union_kept").cast("double")
        ).alias("jaccard"),
    )


def kmv_set_ops_oracle_sql(
    *,
    source_sql: str,
    key_col: str,
    set_col: str,
    k: int = 1024,
) -> str:
    """DuckDB mirror of ``kmv_sample → kmv_set_ops``, generated from
    the same constants (hash suffix/width, k, the T literal) so the
    two cannot drift.  CTEs are MATERIALIZED — each is referenced more
    than once and DuckDB would otherwise inline and re-evaluate."""
    t = _check_k(k)
    h = _kmv_hash_sql(key_col)
    return f"""
WITH __kmv_s AS MATERIALIZED (
  SELECT s, h FROM (
    SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h ASC) AS rn
    FROM (
      SELECT DISTINCT {set_col} AS s, {h} AS h
      FROM ({source_sql})
      WHERE {key_col} IS NOT NULL AND {set_col} IS NOT NULL
    )
  ) WHERE rn <= {k}
), __kmv_pairs AS MATERIALIZED (
  SELECT a.s AS set_a, b.s AS set_b
  FROM (SELECT DISTINCT s FROM __kmv_s) a, (SELECT DISTINCT s FROM __kmv_s) b
  WHERE a.s < b.s
), __kmv_m AS MATERIALIZED (
  SELECT set_a, set_b, h, MAX(in_a) AS a, MAX(in_b) AS b FROM (
    SELECT p.set_a, p.set_b, s.h, 1 AS in_a, 0 AS in_b
    FROM __kmv_pairs p JOIN __kmv_s s ON s.s = p.set_a
    UNION ALL
    SELECT p.set_a, p.set_b, s.h, 0 AS in_a, 1 AS in_b
    FROM __kmv_pairs p JOIN __kmv_s s ON s.s = p.set_b
  ) GROUP BY set_a, set_b, h
), __kmv_kept AS MATERIALIZED (
  SELECT * FROM (
    SELECT set_a, set_b, h, a, b,
           row_number() OVER (PARTITION BY set_a, set_b ORDER BY h ASC) AS rn
    FROM __kmv_m
  ) WHERE rn <= {k}
), __kmv_agg AS MATERIALIZED (
  SELECT set_a, set_b,
         CAST(COUNT(*) AS BIGINT) AS n_union_kept,
         MAX(h) AS hk,
         CAST(SUM(a * b) AS BIGINT) AS n_match
  FROM __kmv_kept GROUP BY set_a, set_b
)
SELECT set_a, set_b, n_union_kept, n_match,
       CAST(CASE WHEN n_union_kept < {k} THEN n_union_kept
                 ELSE {t} // GREATEST(hk, 1) END AS BIGINT) AS union_est,
       CAST(n_match * (CASE WHEN n_union_kept < {k} THEN n_union_kept
                            ELSE {t} // GREATEST(hk, 1) END) // n_union_kept AS BIGINT)
         AS intersect_est,
       CAST(n_match AS DOUBLE) / CAST(n_union_kept AS DOUBLE) AS jaccard
FROM __kmv_agg
"""


def kmv_cardinality_oracle_sql(
    *,
    source_sql: str,
    key_col: str,
    set_col: str,
    k: int = 1024,
) -> str:
    """DuckDB mirror of ``kmv_sample → kmv_cardinality``."""
    t = _check_k(k)
    h = _kmv_hash_sql(key_col)
    return f"""
WITH __kmv_s AS MATERIALIZED (
  SELECT s, h FROM (
    SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h ASC) AS rn
    FROM (
      SELECT DISTINCT {set_col} AS s, {h} AS h
      FROM ({source_sql})
      WHERE {key_col} IS NOT NULL AND {set_col} IS NOT NULL
    )
  ) WHERE rn <= {k}
)
SELECT s AS {set_col},
       CAST(COUNT(*) AS BIGINT) AS n_sample,
       CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                 ELSE {t} // GREATEST(MAX(h), 1) END AS BIGINT) AS kmv_est
FROM __kmv_s GROUP BY s
"""


def build_kmv_store(
    df: DataFrame,
    path: str,
    key_col: str,
    set_col: str,
    *,
    k: int = 1024,
    mode: str = "overwrite",
) -> None:
    """Persist the per-set bottom-k hash sample as a parquet SAMPLE
    STORE — the set-operation sibling of sketch.build_hll_store.
    Append each ingested batch's sample (``mode='append'``); the
    read-time re-select (:func:`kmv_from_store`) equals the
    single-pass sample (KMV property).  Unlike the quantile store,
    re-appending the SAME batch is harmless: duplicate (set, hash)
    rows collapse in the merge's DISTINCT, so appends are
    at-least-once safe (the MAX-merge-grade idempotence HLL has)."""
    kmv_sample(df, key_col, set_col, k=k).write.mode(mode).parquet(path)


def kmv_from_store(
    spark,
    store_path: str,
    set_col: str,
    *,
    k: int = 1024,
    schema: str | None = None,
    batch: DataFrame | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Merged per-set sample from a persisted store, optionally folding
    a NEW batch in at serve time.  ``schema`` (DDL: ``<set_col> <type>,
    __h__ long``) enables cold-start reads of an empty store (zero
    part files have no footers)."""
    _check_k(k)
    reader = spark.read.schema(schema) if schema else spark.read
    sk = reader.parquet(store_path).select(set_col, "__h__")
    if batch is not None:
        if key_col is None:
            raise ValueError("kmv_from_store: batch requires key_col")
        sk = sk.unionByName(kmv_sample(batch, key_col, set_col, k=k))
    return _bottom_k_distinct(sk, set_col, k)
