"""Deterministic mergeable quantile sketch — bounded-state quantile
estimation with an exactly-checkable oracle.

The third classic sketch beside HLL (functions/sketch.py, distinct
counts) and count-min (functions/cms.py, frequencies): ``percentile``
and ``quantile_filter`` answer quantile questions EXACTLY via
PERCENTILE_CONT — a full per-group sort on every refresh, with no
incremental form.  This module bounds the state to k rows per group
and makes refreshes batch-sized.

Why not KLL/t-digest?  Both interpolate (t-digest) or flip coins at
compaction (KLL) — the result depends on arrival order and RNG state,
so two engines can never agree bit-for-bit and the driver's hash gate
could only ever be rows-only.  Instead this is the KMV/bottom-k
construction (the same hash-sampling family as the k-minimum-values
distinct sketch, cf. Bar-Yossef et al.; also how BigQuery-style
hash-sampled quantiles work):

- every row gets the engine-portable 60-bit md5-prefix hash of its
  (unique) id, suffixed ``'#qs'`` to decorrelate from the engine's
  other md5 folds of the same id;
- the sketch keeps, per group, the k rows with the SMALLEST hashes —
  a uniform-without-replacement row sample that is deterministic,
  arrival-order-insensitive, and engine-independent;
- the q-quantile estimate is the PERCENTILE_DISC-style pick from the
  sample: the value at rank ``max(1, ceil(q·n))`` of the sample's
  value order (n = sample size, ≤ k).  NO arithmetic ever touches the
  values themselves — the estimate IS a member of the input — so
  cross-engine equality needs only identical hashing and identical
  integer rank math (q is converted to an exact rational num/den, so
  the rank is pure BIGINT arithmetic in both engines).

Accuracy: the sample quantile of a uniform k-sample has rank error
O(sqrt(q(1-q)/k)) whp (≈1.6% at k=1024, q=0.5) — worse than KLL's
optimal ε-k tradeoff by a log factor, the price of determinism;
tests/test_quantile_sketch.py pins the bound empirically.

Mergeability (the point): bottom-k by a fixed hash is a KMV sketch —
``bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))`` exactly, because
any of the k smallest hashes of the union is among the k smallest of
its own side.  So per-batch sketches APPEND to a parquet store
(:func:`build_qsketch_store`) and a read-time re-select
(:func:`qsketch_merge`) equals the single-pass sketch over the union —
same build/append/serve loop as sketch.build_hll_store, and the same
losslessness proof obligation discharged by the qsketch_store oracle
row.  Re-merging is idempotent; all generations must share k (a
smaller-k generation would have discarded rows a larger-k merge needs).

Scale notes (100 TB): the first build shuffles one narrow (group,
hash, value) stream — the same row count the exact percentile sorts,
but 3 columns wide and never again: every refresh afterwards costs
only the new batch's scan plus a ≤(generations·k) per-group re-select.
When a group-size lower bound is known, ``min_group_rows`` engages a
MAP-SIDE hash prefilter (keep h < 8k/R of the hash space) that cuts
the shuffled stream by ~R/8k with failure probability ≤ exp(-2.4k)
(Chernoff at factor 8) — at R=10^9, k=1024 that is a ~10^5× shuffle
reduction.  Estimation runs on k·|groups| rows — bounded, broadcast.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SUFFIX = "#qs"


def _q_rational(q) -> tuple[int, int]:
    """Exact rational (num, den) for a quantile given as float, str, or
    Fraction.  Floats go through repr so 0.9 means the DECIMAL 9/10,
    not its binary approximation — the rank math must be the same
    integers in both engines."""
    fr = Fraction(repr(q)) if isinstance(q, float) else Fraction(q)
    if not 0 < fr <= 1:
        raise ValueError(f"quantile must be in (0, 1], got {q!r}")
    return fr.numerator, fr.denominator


def _q_parts(q) -> tuple[float, int, int]:
    """(float form, num, den) — the ONE place the float↔rational
    conversion lives, so the Spark side, the oracle generator, and the
    YAML spec validation can never disagree about what a given q
    means (the repr trick above is load-bearing for cross-engine rank
    parity)."""
    num, den = _q_rational(q)
    return num / den, num, den


def _qhash_col(id_col: str):
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(_HASH_SUFFIX))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def _prefilter_threshold(k: int, min_group_rows: int) -> int:
    """Hash-space cutoff for the map-side prefilter: keep h < T with
    T = ceil(2^60 · 8k / R).  Of R rows, the surviving count is
    Binomial(R, 8k/R) with mean 8k; P[fewer than k survive] ≤
    exp(-2·(7k)²/R·(R/8k)·…) — Chernoff gives ≤ exp(-2.4k), i.e.
    negligible for any useful k, so the kept bottom-k is unchanged."""
    space = 1 << 60
    t = -(-space * 8 * k // min_group_rows)  # ceil division
    return min(t, space)


def qsketch_build(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    *,
    k: int = 1024,
    min_group_rows: int | None = None,
) -> DataFrame:
    """The mergeable sketch: per group, the k rows with the smallest
    id-hashes — columns ``group_cols + (__qh__ long, __qv__ <value
    type>)``.  NULL ids and NULL values are skipped (quantiles are
    over non-null values; a NULL id has no hash).  Ids should be
    unique per row — duplicate ids co-select deterministically, which
    biases the sample toward repeated rows.

    ``min_group_rows``: caller-asserted lower bound on EVERY group's
    non-null row count; engages the map-side hash prefilter (module
    docstring).  A group actually smaller than the bound may lose rows
    it should have kept — the bound is a contract, not a hint."""
    if k < 1:
        raise ValueError(f"qsketch k must be >= 1, got {k}")
    if not group_cols:
        # same restriction as hll_distinct: the oracle generator cannot
        # render the global case — group by a constant column instead
        raise ValueError("qsketch_build requires at least one group column")
    # Guard the whole family's working names up front: build's own
    # (__qh__/__qv__/__rn__) plus estimate's (__vr__/__n__/__r__ and the
    # output column "q") — a group column literally named "q" would
    # otherwise produce ambiguous output downstream (ADVICE r07).
    internal = {"__qh__", "__qv__", "__rn__", "__vr__", "__n__", "__r__", "q"}
    collisions = internal & (set(df.columns) | set(group_cols))
    if collisions:
        raise ValueError(
            f"qsketch_build: column(s) {sorted(collisions)} collide with "
            "internal names — rename them first"
        )
    base = df.where(
        F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *group_cols,
        _qhash_col(id_col).alias("__qh__"),
        F.col(value_col).alias("__qv__"),
    )
    if min_group_rows is not None:
        if min_group_rows < k:
            raise ValueError(
                f"min_group_rows ({min_group_rows}) must be >= k ({k}) — a "
                "group that small needs no prefilter"
            )
        base = base.where(
            F.col("__qh__") < F.lit(_prefilter_threshold(k, min_group_rows))
        )
    return _bottom_k(base, group_cols, k)


def _bottom_k(rows: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """k smallest-hash rows per group; the (h, v) tiebreak makes the
    kept MULTISET deterministic even under duplicate ids."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__qh__").asc(), F.col("__qv__").asc()
    )
    return (
        rows.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def qsketch_merge(sk: DataFrame, group_cols: list[str], *, k: int) -> DataFrame:
    """Re-select the bottom-k of a sketch table holding several
    appended generations — EXACTLY the single-pass sketch of the
    underlying union (KMV property, module docstring).  Idempotent, so
    always safe after a store read.  All generations must share k."""
    return _bottom_k(sk, group_cols, k)


def qsketch_estimate(
    sk: DataFrame,
    group_cols: list[str],
    qs: list,
    *,
    est_col: str = "est",
) -> DataFrame:
    """Quantile estimates from a (merged) sketch: one row per
    (group, q) — ``group_cols, q (double), est_col (value type)``.
    The estimate is the sample value at rank ``max(1, ceil(q·n))`` in
    value order — a MEMBER of the sample, picked with pure integer
    rank math, never interpolated.  Runs on the bounded k·|groups|
    sketch: one window, one count, one broadcast join."""
    if not qs:
        raise ValueError("qsketch_estimate needs at least one quantile")
    clashes = ({"__vr__", "__n__", "__r__", "q", est_col}) & set(group_cols)
    if clashes:
        raise ValueError(
            f"qsketch_estimate: group column(s) {sorted(clashes)} collide "
            "with internal/output names — rename them first"
        )
    if est_col in {"__vr__", "__n__", "__r__", "q", "__qh__", "__qv__"}:
        raise ValueError(f"qsketch_estimate: est_col {est_col!r} is reserved")
    rationals = [_q_parts(q) for q in qs]
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__qv__").asc(), F.col("__qh__").asc()
    )
    ranked = sk.withColumn("__vr__", F.row_number().over(w).cast("long"))
    n = sk.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n__"))
    targets = n.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qf).cast("double").alias("q"),
                        F.expr(
                            f"GREATEST((__n__ * {num} + {den - 1}) DIV {den}, 1L)"
                        ).alias("__r__"),
                    )
                    for qf, num, den in rationals
                ]
            )
        ).alias("t"),
    ).select(*group_cols, F.col("t.q").alias("q"), F.col("t.__r__").alias("__r__"))
    return (
        ranked.join(F.broadcast(targets), group_cols)
        .where(F.col("__vr__") == F.col("__r__"))
        .select(*group_cols, "q", F.col("__qv__").alias(est_col))
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    qs: list,
    *,
    k: int = 1024,
    min_group_rows: int | None = None,
    est_col: str = "est",
) -> DataFrame:
    """Build + estimate in one call — the one-shot form the flow op
    and the quantile_sketch query expose."""
    sk = qsketch_build(
        df, value_col, id_col, group_cols, k=k, min_group_rows=min_group_rows
    )
    return qsketch_estimate(sk, group_cols, qs, est_col=est_col)


def build_qsketch_store(
    df: DataFrame,
    path: str,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    *,
    k: int = 1024,
    mode: str = "overwrite",
) -> None:
    """Persist the sketch as a parquet SAMPLE STORE — the quantile
    sibling of sketch.build_hll_store: built once, APPENDED per batch
    (``mode='append'``), re-selected at read time.  Each append writes
    ≤ |groups|·k rows; compact piled-up generations by rewriting the
    re-merged table with ``mode='overwrite'``.  Every generation must
    use the same k.  Appends are strictly AT-MOST-ONCE: re-appending a
    batch duplicates its (hash, value) rows, the bottom-k re-select
    then keeps ~k/2 distinct rows twice each, and estimates run on a
    duplicate-inflated half-support sample — lossy even with unique
    ids (tests/test_quantile_sketch.py pins single-append
    correctness; the double-append failure mode mirrors
    cms_store's)."""
    qsketch_build(df, value_col, id_col, group_cols, k=k).write.mode(mode).parquet(
        path
    )


def qsketch_from_store(
    spark,
    store_path: str,
    group_cols: list[str],
    *,
    k: int = 1024,
    schema: str | None = None,
    batch: DataFrame | None = None,
    value_col: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Merged sketch from a persisted store, optionally folding a NEW
    batch in at serve time.  ``schema`` (DDL covering the group columns
    plus ``__qh__ long, __qv__ <type>``) makes cold-start reads of an
    EMPTY store work — zero part files have no footers to infer from
    (same contract as sketch.hll_from_store)."""
    reader = spark.read.schema(schema) if schema else spark.read
    sk = reader.parquet(store_path).select(*group_cols, "__qh__", "__qv__")
    if batch is not None:
        if value_col is None or id_col is None:
            raise ValueError("qsketch_from_store: batch requires value_col and id_col")
        sk = sk.unionByName(qsketch_build(batch, value_col, id_col, group_cols, k=k))
    return qsketch_merge(sk, group_cols, k=k)


def qsketch_oracle_sql(
    *,
    table: str,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    qs: list,
    k: int = 1024,
    est_col: str = "est",
) -> str:
    """DuckDB mirror of quantile_sketch, generated from the same
    constants (hash suffix, k, exact rational ranks) so the two cannot
    drift.

    Models the UNFILTERED build only: there is deliberately no
    ``min_group_rows`` parameter, because the map-side prefilter is
    probabilistic — pairing a prefiltered Spark side with this oracle
    would diverge whenever the filter drops a bottom-k row of an
    undersized group.  Queries that want an oracle-checked prefilter
    must guarantee every group's row count >= min_group_rows, in which
    case the kept bottom-k is unchanged (see _prefilter_threshold) and
    this unfiltered SQL remains the exact mirror — that equivalence is
    itself oracle-checked by the qsketch_prefilter row."""
    if not group_cols:
        raise ValueError("qsketch_oracle_sql requires at least one group column")
    g = ", ".join(group_cols)
    rationals = [_q_parts(q) for q in qs]
    targets = " UNION ALL ".join(
        f"SELECT {g}, CAST({qf!r} AS DOUBLE) AS q, "
        f"GREATEST((nn * {num} + {den - 1}) // {den}, 1) AS r FROM __qs_n"
        for qf, num, den in rationals
    )
    return f"""
WITH __qs_base AS (
  SELECT {g},
         ('0x' || substr(md5(CAST({id_col} AS VARCHAR) || '{_HASH_SUFFIX}'), 1, 15))::BIGINT AS h,
         {value_col} AS v
  FROM {table}
  WHERE {id_col} IS NOT NULL AND {value_col} IS NOT NULL
), __qs_sk AS (
  SELECT {g}, h, v FROM (
    SELECT {g}, h, v,
           row_number() OVER (PARTITION BY {g} ORDER BY h ASC, v ASC) AS rn
    FROM __qs_base
  ) WHERE rn <= {k}
), __qs_ranked AS (
  SELECT {g}, v,
         row_number() OVER (PARTITION BY {g} ORDER BY v ASC, h ASC) AS vr
  FROM __qs_sk
), __qs_n AS (
  SELECT {g}, CAST(COUNT(*) AS BIGINT) AS nn FROM __qs_sk GROUP BY ALL
), __qs_targets AS ({targets})
SELECT r.{g.replace(', ', ', r.')}, t.q, r.v AS {est_col}
FROM __qs_ranked r
JOIN __qs_targets t ON {" AND ".join(f"r.{c} = t.{c}" for c in group_cols)}
 AND r.vr = t.r
"""
