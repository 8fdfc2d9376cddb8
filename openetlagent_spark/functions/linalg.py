"""Distributed exact Gram matrix + driver-side PCA — the spectral
companion to the embedding family (similarity.py ANN, clustering.py
k-means, curation.py centroids): one bounded-output pass over the
corpus produces the dim×dim second-moment matrix, and every spectral
quantity (principal components, explained variance, whitening) is then
DRIVER-SIDE math on dim² numbers — state bounded by the embedding
width, never the corpus, which is what makes PCA feasible at 100 TB.

Determinism discipline (the repo standard): components quantize per
row to ``FLOOR(v · 2^q_bits)`` BIGINTs (cast float→double is exact, a
power-of-two multiply is a bare exponent shift, floor is exact), and
every Gram entry is an INTEGER sum of integer products — associative
and commutative, so partition order, batch boundaries, and merge trees
cannot move a single bit, and the result hash-matches a generated
DuckDB oracle.

The heavy pass is ``mapInPandas`` — a genuine BLAS case (numpy int64
``Q.T @ Q`` per Arrow batch), the documented exception to the
built-ins-first rule: per-batch partials are dim·(dim+1)/2 rows
regardless of batch size, the final shuffle carries only
|partitions|·dim² integers.  Overflow is guarded per batch (the bound
is checked against the quantization headroom BEFORE multiplying;
numpy int64 would wrap silently) and across batches by Spark's ANSI
BIGINT sum.

The eigen step (:func:`top_eigenvector`) is deterministic fixed-count
power iteration on the dim×dim matrix in driver numpy — bounded state,
library-grade (exercised by unit tests against numpy's eigh; not an
oracle query: cross-engine bit-parity of iterated normalization is
not claimed).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_Q_BITS = 20


def _check_gram_args(dim: int, q_bits: int) -> None:
    if dim < 1:
        raise ValueError(f"embedding_gram dim must be >= 1, got {dim}")
    if not 0 <= q_bits <= 30:
        raise ValueError(f"embedding_gram q_bits must be in [0, 30], got {q_bits}")


def embedding_gram(
    df: DataFrame,
    vec_col: str,
    dim: int,
    *,
    q_bits: int = DEFAULT_Q_BITS,
) -> DataFrame:
    """Upper-triangle Gram (second-moment) matrix of the quantized
    embeddings: one row per ``0 <= i <= j < dim`` with ``sum_q =
    Σ_rows q_i · q_j`` (BIGINT).  Rows with NULL vectors or a size
    other than ``dim`` are excluded (mirrored in the oracle WHERE) —
    a silent dim mismatch would zero-pad garbage into the spectrum.

    Dequantize driver-side with :func:`gram_matrix` (÷ 2^(2·q_bits)).
    """
    _check_gram_args(dim, q_bits)
    import numpy as np
    import pandas as pd

    scale = float(1 << q_bits)
    vecs = df.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    ).select(F.col(vec_col).cast("array<double>").alias("__v__"))

    iu, ju = np.triu_indices(dim)

    def partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            v = np.stack(b["__v__"].to_numpy())  # (rows, dim) float64
            # Loud on non-finite components: a NaN (which is also how a
            # NULL array ELEMENT arrives through Arrow) would both
            # corrupt the integer Gram silently (NaN→INT64_MIN on
            # astype) and poison the max-based overflow guard below —
            # and the DuckDB oracle errors loudly on the same input,
            # so silence here would be a cross-engine divergence.
            if not np.isfinite(v).all():
                raise ValueError(
                    "embedding_gram: non-finite embedding component "
                    "(NaN/inf, or a NULL array element) in a batch — "
                    "clean the vectors first"
                )
            q = np.floor(v * scale)
            # int64 headroom check BEFORE the matmul: numpy wraps
            # silently.  |entry| <= rows * maxq^2 must stay < 2^62.
            maxq = float(np.max(np.abs(q))) if q.size else 0.0
            if maxq > 0 and len(b) * maxq * maxq >= float(1 << 62):
                raise ValueError(
                    "embedding_gram: batch partial could overflow int64 "
                    f"(rows={len(b)}, max|q|={maxq:.3g}); lower q_bits"
                )
            qi = q.astype(np.int64)
            g = qi.T @ qi
            yield pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"), "part_q": g[iu, ju]}
            )

    partials = vecs.mapInPandas(partial_gram, schema="i int, j int, part_q long")
    return partials.groupBy("i", "j").agg(
        F.sum("part_q").cast("long").alias("sum_q")
    )


def embedding_gram_oracle_sql(
    *,
    table: str,
    vec_col: str,
    dim: int,
    q_bits: int = DEFAULT_Q_BITS,
) -> str:
    """DuckDB mirror of :func:`embedding_gram`, generated from the
    same (dim, q_bits) so the two cannot drift: quantize each list
    element with the identical FLOOR(·2^q_bits) expression, cross the
    upper-triangle index grid, and integer-sum the products.  The
    quantized CTE is MATERIALIZED — it is referenced once per (i, j)
    pair by the grid join and DuckDB would otherwise re-evaluate the
    list_transform dim·(dim+1)/2 times."""
    _check_gram_args(dim, q_bits)
    scale = float(1 << q_bits)
    return f"""
WITH __eg_q AS MATERIALIZED (
  SELECT list_transform({vec_col},
                        v -> CAST(FLOOR(CAST(v AS DOUBLE) * {scale!r}) AS BIGINT))
           AS qv
  FROM {table}
  WHERE {vec_col} IS NOT NULL AND len({vec_col}) = {dim}
)
SELECT ti.i, tj.j, CAST(SUM(qv[ti.i + 1] * qv[tj.j + 1]) AS BIGINT) AS sum_q
FROM __eg_q
CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1})) AS i) ti
CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1})) AS j) tj
WHERE ti.i <= tj.j
GROUP BY ti.i, tj.j
"""


def gram_matrix(rows, dim: int, *, q_bits: int = DEFAULT_Q_BITS):
    """Symmetric float64 Gram matrix from collected ``(i, j, sum_q)``
    rows (dequantized by 2^(2·q_bits)) — the bounded dim² driver-side
    state every spectral routine below consumes."""
    import numpy as np

    _check_gram_args(dim, q_bits)
    g = np.zeros((dim, dim), dtype=np.float64)
    inv = 1.0 / float(1 << (2 * q_bits))
    for r in rows:
        i, j, s = int(r["i"]), int(r["j"]), r["sum_q"]
        if not (0 <= i <= j < dim):
            raise ValueError(f"gram_matrix: bad index pair ({i}, {j}) for dim={dim}")
        v = (0 if s is None else int(s)) * inv
        g[i, j] = v
        g[j, i] = v
    return g


def top_eigenvector(g, *, iters: int = 200):
    """Deterministic power iteration on a symmetric PSD matrix:
    returns ``(eigenvalue, unit_vector)`` for the dominant component.
    Fixed iteration count and a fixed deterministic start (the
    all-ones direction, which is never orthogonal to the top
    eigenvector of a second-moment matrix of real data in practice;
    degenerate exact-orthogonality would surface as a zero norm and
    raises rather than silently returning noise).  Driver-side numpy
    on a dim×dim matrix — bounded state, independent of corpus size.
    The sign convention fixes the largest-|component| entry positive
    so results are comparable across runs."""
    import numpy as np

    g = np.asarray(g, dtype=np.float64)
    if g.ndim != 2 or g.shape[0] != g.shape[1]:
        raise ValueError(f"top_eigenvector needs a square matrix, got {g.shape}")
    if iters < 1:
        raise ValueError(f"top_eigenvector iters must be >= 1, got {iters}")
    v = np.ones(g.shape[0], dtype=np.float64)
    v /= math.sqrt(float(g.shape[0]))
    for _ in range(iters):
        w = g @ v
        n = float(np.linalg.norm(w))
        if n == 0.0:
            raise ValueError(
                "top_eigenvector: iterate collapsed to zero (start vector "
                "orthogonal to the range, or zero matrix)"
            )
        v = w / n
    lam = float(v @ (g @ v))
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    return lam, v


def pca_project(df: DataFrame, vec_col: str, component, *, out_col: str = "pc1") -> DataFrame:
    """Project every embedding onto a (driver-computed) principal
    component: the component embeds as a plan literal and the dot
    product is a left-to-right JVM fold — one codegen scan, no UDF,
    no shuffle; the serving leg of the Gram→eigen→project loop."""
    comp = [float(x) for x in component]
    arr = F.array(*[F.lit(x) for x in comp])
    v = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return df.withColumn(
        out_col, F.when(F.size(F.col(vec_col)) == len(comp), dot)
    )
