"""Deterministic distributed k-means over embedding columns — corpus
clustering for training-data curation (domain balancing, diversity
sampling, per-cluster quota mixes).

The reference engine (Antix5/OpenETLAgent) has no clustering vocabulary
(SURVEY §2.2); this extends the engine like the dedup/similarity
families, and — unusually for an iterative float algorithm — the WHOLE
pipeline is exactly oracle-checkable.  Three design moves make Lloyd's
algorithm bit-deterministic across engines and partition orders:

1. **Quantized inputs.** Embeddings are snapped once to an integer grid
   (``round(x * 2^scale_bits)``; round-half-away-from-zero matches
   between Spark and DuckDB).  From then on every accumulated quantity
   — centroid sums, member counts — is INTEGER arithmetic: exact and
   partition-order-independent, where a double sum would drift in the
   last ulp per partitioning.
2. **Derived doubles only per row.** Centroid coordinates are
   ``sum/count`` (one correctly-rounded IEEE division of exact
   integers); distances fold ``(x - c)^2`` left-to-right in dimension
   order from exact inputs.  No double is ever accumulated across rows.
3. **Deterministic everything else.** Init picks the ``k`` vectors with
   the smallest ``md5(id)`` (a seedless deterministic pseudo-random
   draw, same trick as the engine's hash split); argmin ties break on
   the lower cluster id; empty clusters keep their previous centroid.

Scale shape (100 TB): the quantized table persists once; each Lloyd
iteration is ONE scan computing assignments against k×dim centroid
literals (parsed-SQL array literal — no py4j cost, no join) plus a
map-side-combined k-row aggregate; only k rows ever reach the driver
per iteration (same bounded-collect class as IVF centroid sampling).
Iteration count is fixed and small — the standard mini-batch/fixed-iter
trade for petabyte corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import infer_dim


def _quantize(vec_col: Column, scale_bits: int) -> Column:
    """Scale each coordinate onto the integer grid.  NaN/±Inf or
    magnitudes beyond the grid's int64 range fail the ANSI long cast;
    try_cast + raise_error turns that into a CLEAR executor-side error
    naming the operator and the bound (the engine's strict-cast
    pattern, operators/core.py casting) instead of a bare
    CAST_OVERFLOW from deep inside a Lloyd iteration."""
    scale = float(1 << scale_bits)
    bound = float(2**63 - 1) / scale

    def q(x: Column) -> Column:
        scaled = F.round(x * F.lit(scale)).try_cast("long")
        return F.when(
            x.isNotNull() & scaled.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "kmeans quantization overflow: |coordinate| must be finite "
                        f"and < {bound:.3e} (scale_bits={scale_bits}), got "
                    ),
                    x.cast("string"),
                )
            ).cast("long"),
        ).otherwise(scaled)

    return F.transform(vec_col.cast("array<double>"), q)


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale_bits: int = 20,
) -> DataFrame:
    """Assign every vector to one of ``k`` clusters after ``iters``
    Lloyd updates from the md5-rank init.  Returns (id, cluster,
    dist) where ``dist`` is the squared quantized-grid distance to the
    final centroid (double, deterministic).

    Centroid state lives driver-side between iterations as exact
    integers (k×(dim+1) values — bounded), embedded into the next
    assignment pass as a parsed array literal."""
    dim = infer_dim(df, vec_col)
    base = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__id__"), _quantize(F.col(vec_col), scale_bits).alias("xq"))
        .persist()  # one quantization pass feeds every Lloyd iteration
    )

    init_rows = (
        base.select("__id__", "xq", F.md5(F.col("__id__").cast("string")).alias("__h__"))
        .orderBy("__h__")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds the {len(init_rows)} available vectors")
    # centroid j = (sums, count); init: the vector itself, count 1
    state = [(list(r["xq"]), 1) for r in init_rows]

    def centroid_doubles() -> list[list[float]]:
        return [[s / cnt for s in sums] for sums, cnt in state]

    def assigned() -> DataFrame:
        # One parsed SQL expression per assignment pass (r13): the
        # Column-op construction of k zip_with/aggregate folds cost
        # 0.7-1.4 s of serial DRIVER time per build (3 builds per call;
        # the lambda machinery is py4j-chatty even with call-site
        # capture off), vs ~0.1 s formatting+parsing the identical
        # expression as SQL text with each centroid's 64 doubles
        # inlined per struct.  The parsed tree is the same
        # zip_with/aggregate fold — ((0 + (x1-c1)^2) + (x2-c2)^2) + …,
        # fixed fold order, exact inputs — so values stay bit-identical
        # to the oracle's unrolled chain (pinned:
        # test_optimization_r13.py kmeans construction pin;
        # repr(float) round-trips each coordinate exactly, the
        # _array_literal convention).
        cents = centroid_doubles()

        def arr(c: list[float]) -> str:
            return "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"

        structs = ",".join(
            f"struct(aggregate(zip_with(cast(xq as array<double>), {arr(cents[j])}, "
            f"(x, c) -> (x - c) * (x - c)), 0.0D, (acc, v) -> acc + v) AS d, "
            f"{j} AS cid)"
            for j in range(k)
        )
        choice = F.expr(f"array_min(array({structs}))")
        return base.select(
            "__id__", "xq", choice["cid"].alias("cluster"), choice["d"].alias("dist")
        )

    # sum terms as parsed SQL for the same driver-time reason (one
    # py4j call per term instead of three)
    sum_terms = [F.expr(f"sum(element_at(xq, {j + 1})) AS s{j}") for j in range(dim)]
    for _ in range(iters):
        sums_rows = (
            assigned()
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("cnt"), *sum_terms)
            .collect()
        )
        by_cid = {r["cluster"]: r for r in sums_rows}
        state = [
            ([by_cid[j][f"s{j_}"] for j_ in range(dim)], by_cid[j]["cnt"])
            if j in by_cid
            else state[j]  # empty cluster keeps its previous centroid
            for j in range(k)
        ]

    final = assigned().select(F.col("__id__").alias(id_col), "cluster", "dist")
    # The cache only serves the per-iteration collects above; the final
    # (lazy) assignment re-derives the quantized grid from the scan, so
    # release the executor memory instead of pinning it for the
    # session's lifetime (bench/harness loops run many operators).
    base.unpersist()
    return final


def kmeans_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale_bits: int = 20,
    dim: int = 64,
) -> str:
    """DuckDB mirror of kmeans_assign: the same md5-rank init, the same
    fixed number of unrolled Lloyd iterations as chained CTEs, the same
    integer centroid sums, and the same left-associated distance fold —
    generated from the same parameters so plan and oracle cannot
    drift."""
    scale = float(1 << scale_bits)
    xq = (
        f"list_transform(CAST({vec_col} AS DOUBLE[]), "
        f"x -> CAST(round(x * {scale!r}) AS BIGINT))"
    )

    def dist_expr(b: str, c: str) -> str:
        # unrolled ((0 + d1) + d2) ... chain — matches F.aggregate's fold
        acc = "0.0"
        for j in range(1, dim + 1):
            d = f"(CAST({b}.xq[{j}] AS DOUBLE) - {c}.cen[{j}])"
            acc = f"({acc} + {d} * {d})"
        return acc

    sums = ", ".join(f"SUM(a.xq[{j}]) AS s{j}" for j in range(1, dim + 1))
    cen_from_sums = "[" + ", ".join(
        f"CAST(s{j} AS DOUBLE) / CAST(cnt AS DOUBLE)" for j in range(1, dim + 1)
    ) + "]"

    parts = [
        f"base AS (SELECT {id_col} AS vid, {xq} AS xq FROM {table} "
        f"WHERE {vec_col} IS NOT NULL)",
        f"init AS (SELECT vid, xq, row_number() OVER "
        f"(ORDER BY md5(CAST(vid AS VARCHAR))) - 1 AS cid FROM base "
        f"ORDER BY md5(CAST(vid AS VARCHAR)) LIMIT {k})",
        "c0 AS (SELECT cid, list_transform(xq, v -> CAST(v AS DOUBLE)) AS cen FROM init)",
    ]
    prev = "c0"
    for i in range(iters):
        assign = f"a{i}"
        parts.append(
            f"{assign} AS (SELECT vid, xq, cluster FROM ("
            f"SELECT b.vid, b.xq, c.cid AS cluster, row_number() OVER "
            f"(PARTITION BY b.vid ORDER BY {dist_expr('b', 'c')}, c.cid) AS rn "
            f"FROM base b CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        nxt = f"c{i + 1}"
        parts.append(
            f"{nxt} AS (SELECT p.cid, CASE WHEN g.cnt IS NULL THEN p.cen "
            f"ELSE {cen_from_sums} END AS cen FROM {prev} p LEFT JOIN ("
            f"SELECT a.cluster AS cid, COUNT(*) AS cnt, {sums} "
            f"FROM a{i} a GROUP BY a.cluster) g ON g.cid = p.cid)"
        )
        prev = nxt
    final = (
        f"SELECT vid AS {id_col}, cluster, dist FROM ("
        f"SELECT b.vid, c.cid AS cluster, {dist_expr('b', 'c')} AS dist, "
        f"row_number() OVER (PARTITION BY b.vid ORDER BY {dist_expr('b', 'c')}, c.cid) AS rn "
        f"FROM base b CROSS JOIN {prev} c) WHERE rn = 1"
    )
    return "WITH " + ", ".join(parts) + " " + final


def diversity_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    per_cluster: int = 10,
    scale_bits: int = 20,
) -> DataFrame:
    """Cluster-balanced sampling: k-means the corpus, then keep the
    ``per_cluster`` md5-rank-lowest members of EVERY cluster — the
    diversity-quota sample for training mixes (a uniform hash sample
    over-represents dense regions; the per-cluster quota guarantees
    coverage of small modes).  Fully deterministic: the assignment is
    kmeans_assign's, the within-cluster draw is the engine's standard
    seedless md5 rank.  Returns (id, cluster).

    Scale: one extra window over the assignment, partitioned by cluster
    — k partitions, each a bounded top-``per_cluster`` heap under AQE;
    no new wide shuffle beyond the per-cluster re-key."""
    from pyspark.sql import Window

    assigned = kmeans_assign(df, id_col, vec_col, k, iters, scale_bits)
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        assigned.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= per_cluster)
        .select(id_col, "cluster")
    )


def diversity_sample_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    per_cluster: int = 10,
    scale_bits: int = 20,
    dim: int = 64,
) -> str:
    """DuckDB mirror of diversity_sample: the kmeans oracle wrapped in
    the same md5-rank per-cluster quota window."""
    inner = kmeans_oracle_sql(table, id_col, vec_col, k, iters, scale_bits, dim)
    return (
        f"SELECT {id_col}, cluster FROM ("
        f"SELECT {id_col}, cluster, row_number() OVER (PARTITION BY cluster "
        f"ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn "
        f"FROM ({inner})) WHERE rn <= {per_cluster}"
    )
