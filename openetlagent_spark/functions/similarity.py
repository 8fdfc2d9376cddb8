"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — broadcast the (small) query
  set against the corpus, JVM-side dot products (zip_with + aggregate,
  no Python), window top-k per query.  The correctness baseline.
- lsh_topk: sign-LSH bucketed approximate top-k — candidates share a
  hyperplane sign pattern in ≥1 table, exact cosine re-ranks.  The
  scale path: candidate generation is a bucket equi-join (shuffle on
  bucket), not a cross join; recall < 1, tunable via n_tables/n_planes.
- ivf_topk: inverted-file index — k-means-style centroids fitted on a
  driver-side sample (deterministic numpy), corpus assigned to nearest
  centroid (broadcast centroid array, JVM expressions), queries probe
  the ``nprobe`` nearest centroid partitions only.

All cosines are computed in double with a fixed left-to-right fold
order, so results are deterministic and engine-comparable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Left-to-right double dot product — deterministic fold order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL cosine (sorted last /
    # filtered out) instead of raising under ANSI mode — the driver's
    # session runs Spark 4's ANSI default.
    return F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for every query vector: (query_id,
    neighbor_id, rank).  Self-matches excluded.  The query side is
    broadcast — the corpus is never shuffled, the join is a broadcast
    nested loop scanning the corpus once."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine", cosine_expr(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from one row (tiny probe job — NOT
    memoized: a cache keyed on the plan can go stale when the
    underlying file is rewritten with different-dimension vectors, and
    a wrong dim silently collapses every LSH bucket; see below).  The
    hyperplane literals must match the vector length exactly —
    zip_with pads mismatches with nulls, which would NULL every dot
    product and collapse all signatures to one bucket."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dimension from column '{vec_col}'")
    return int(row["d"])


def hyperplane_signature(vec: Column, n_planes: int = 8, seed: int = 42, dim: int = 64) -> Column:
    """Sign pattern of the vector against ``n_planes`` deterministic
    random hyperplanes, packed into a long.  Single-table special case
    of multi_table_signatures — numpy's RNG stream makes the 1-table
    planes identical to a standalone draw, so existing signatures are
    unchanged.  ``dim`` MUST equal the embedding length (see
    infer_dim)."""
    return F.element_at(multi_table_signatures(vec, n_planes, 1, seed, dim), 1)


def _array_literal(values) -> Column:
    """Deeply nested double-array literal via ONE parsed SQL string.
    ``F.lit`` on a nested Python list pays a py4j element-by-element
    conversion (measured 1.4 s for 8×4×64 doubles); formatting the
    same values as ``array(array(...))`` SQL text and parsing it
    JVM-side is ~30 ms.  ``repr(float)`` is the shortest round-trip
    form, so values survive exactly."""

    def fmt(v) -> str:
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        return f"{float(v)!r}D"

    return F.expr(fmt(values))


def rademacher_planes(
    n_tables: int, n_planes: int, dim: int, seed: int
) -> list[list[list[float]]]:
    """±1.0 hyperplanes from a seeded Python RNG — the Rademacher
    sign-projection LSH family (same angular-distance guarantees as
    Gaussian planes, a standard sparse/binary simplification).  Because
    every coefficient is ±1.0, each projection is an exact-float
    add/subtract chain any engine evaluates bit-identically in the same
    fold order — which makes the ENTIRE sign-LSH blocking stage
    SQL-oracle-checkable (see dedup.embedding_pairs_oracle_sql).  The
    same Python list feeds the Spark literal and the generated SQL, so
    the two cannot drift."""
    import random as _random

    rng = _random.Random(seed)
    return [
        [[float(rng.choice((-1.0, 1.0))) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def multi_table_signatures(
    vec: Column, n_planes: int, n_tables: int, seed: int, dim: int,
    rademacher: bool = False,
) -> Column:
    """``array<long>`` of hyperplane signatures, one per LSH table, from
    ONE 3-D plane literal and one nested transform/aggregate expression.
    Building per-table signature columns costs n_tables × n_planes × dim
    py4j literal round-trips (measured: seconds of driver time); this
    form is a handful of calls and evaluates in one JVM pass.

    ``rademacher``: draw ±1.0 planes (rademacher_planes) instead of
    Gaussian — engine-exact, enabling a full SQL oracle over the
    blocking stage."""
    if rademacher:
        tables_lit = _array_literal(rademacher_planes(n_tables, n_planes, dim, seed))
    else:
        rng = np.random.RandomState(seed)
        tables_lit = _array_literal(rng.randn(n_tables, n_planes, dim))
    return F.transform(
        tables_lit,
        lambda planes: F.aggregate(
            F.transform(
                planes,
                lambda p: F.when(dot_expr(vec, p) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, bit: acc * F.lit(2).cast("long") + bit,
        ),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share a bucket in ≥1 LSH table,
    exact cosine re-ranks.  Each side is ONE scan: the per-table
    signatures come out of multi_table_signatures as an array and
    posexplode to (tbl, bucket) rows — no n_tables-way union, and the
    only shuffle is on (tbl, bucket).

    Knobs: fewer planes → coarser buckets → more candidates and higher
    recall; more tables → more chances to collide → higher recall.  The
    defaults (4 planes × 8 tables) measure ~0.7 recall@10 on uniform
    random 64-d embeddings — the hardest case; clustered real embeddings
    do much better.  Near-dup detection (high-cosine pairs only) should
    instead use tight buckets (8+ planes), as embedding_neardup_pairs
    does."""
    dim = infer_dim(corpus, vec_col)
    c_all = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.posexplode(
            multi_table_signatures(
                F.col(vec_col).cast("array<double>"), n_planes, n_tables, seed, dim
            )
        ).alias("tbl", "bucket"),
    )
    q_all = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.posexplode(
            multi_table_signatures(
                F.col(vec_col).cast("array<double>"), n_planes, n_tables, seed, dim
            )
        ).alias("tbl", "bucket"),
    )

    cand = (
        c_all.join(F.broadcast(q_all), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_expr(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 10_000,
    seed: int = 42,
    iters: int = 10,
) -> DataFrame:
    """IVF approximate top-k: fit centroids on a bounded driver-side
    sample (deterministic Lloyd's iterations in numpy), assign corpus
    rows to their nearest centroid (broadcast literals, JVM exprs), then
    each query scans only its ``nprobe`` closest centroid lists."""
    # sample only rows with a full-dimension, all-finite vector — NULL
    # embeddings or ragged lengths would make the numpy sample
    # inhomogeneous, and NaN/Inf coordinates would poison the centroid
    # means into unparseable literals (brute/LSH variants skip such
    # rows too)
    dim = infer_dim(corpus, vec_col)
    bad = F.exists(
        F.col("v"), lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    sample = np.asarray(
        [
            r[0]
            for r in corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
            .filter(F.col("v").isNotNull() & (F.size("v") == dim) & ~bad)
            .limit(sample_size)
            .collect()
        ]
    )
    if len(sample) == 0:
        raise ValueError(f"ivf_topk: no non-null {dim}-element vectors in {vec_col!r}")
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for ci in range(len(centroids)):
            members = sample[assign == ci]
            if len(members):
                centroids[ci] = members.mean(axis=0)

    cents_lit = _array_literal(centroids)

    def nearest_expr(vec: Column, n: int) -> Column:
        """Array of the n nearest centroid ids for a vector — one
        transform over the centroid literal (py4j-cheap, JVM-evaluated)
        instead of a per-centroid literal array."""
        dists = F.transform(
            cents_lit,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                i.alias("cid"),
            ),
        )
        return F.slice(F.transform(F.array_sort(dists), lambda s: s["cid"]), 1, n)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cid", nearest_expr(F.col("cv"), 1)[0])
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("cid", F.explode(nearest_expr(F.col("qv"), nprobe)))

    cand = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group mean vectors, EXPLODED as (group, dim_pos, centroid,
    n_vecs) rows — the distributed centroid primitive behind class
    prototypes, IVF coarse quantizers, and embedding-drift monitoring.

    Shape: posexplode the vectors (narrow — one (group, pos, value)
    stream), ONE shuffle on (group, pos), QUANTIZED integer sums
    (floor(v·2^20) — the same bit-determinism trade as kmeans'
    scale_bits: a double→decimal cast rounds HALF_UP in Spark but can
    land on the other side of a tie in DuckDB, while floor has no
    ties), and a per-row division back to double.  The output is
    |groups| × dim rows — model-sized, not data-sized.  Exploding
    (rather than re-assembling arrays) keeps every value a scalar
    double, so results hash-check exactly across engines.

    NULL vectors contribute nothing; ``n_vecs`` counts the vectors
    that actually carried each dimension (ragged inputs surface as
    differing n_vecs across dim_pos — a data-quality signal, not an
    error)."""
    scale = float(1 << 20)
    per = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    return (
        per.groupBy(group_col, F.col("pos").alias("dim_pos"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.floor(F.col("v") * F.lit(scale))).alias("_x_qsum"),
        )
        .select(
            group_col,
            F.col("dim_pos").cast("long").alias("dim_pos"),
            (F.col("_x_qsum").cast("double") / F.lit(scale) / F.col("n_vecs")).alias(
                "centroid"
            ),
            "n_vecs",
        )
    )


def embedding_centroids_oracle_sql(
    table: str,
    group_col: str,
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`embedding_centroids` — same posexplode
    (0-based, via the unnest(generate_series) idiom; DuckDB has no
    WITH ORDINALITY), same floor-quantized integer sums, same division
    operand order."""
    return (
        f"SELECT {group_col}, CAST(i - 1 AS BIGINT) AS dim_pos, "
        f"CAST(SUM(CAST(FLOOR(l[CAST(i AS INTEGER)] * 1048576.0) AS BIGINT)) AS DOUBLE) "
        f"/ 1048576.0 / COUNT(*) AS centroid, COUNT(*) AS n_vecs "
        f"FROM (SELECT {group_col}, l, unnest(generate_series(1, len(l))) AS i "
        f"FROM (SELECT {group_col}, CAST({vec_col} AS DOUBLE[]) AS l FROM {table})) "
        f"GROUP BY {group_col}, i"
    )
