"""Model-based quality scoring — the fastText-shaped linear classifier
gate modern pretraining pipelines (DCLM, FineWeb-Edu, RedPajama-v2)
run AFTER the rule heuristics: tokens hash into a fixed weight table
(the hashing trick), the document score is the mean bucket weight plus
a bias, and a threshold keeps/drops.

The reference engine (Antix5/OpenETLAgent) has no model-scoring
vocabulary (SURVEY §2.2); this extends the engine like the text/dedup
families.  The SHAPE is the real production one — O(tokens) JVM
expressions, a broadcast weight literal, no UDF, one scan — while the
default WEIGHTS are a deterministic seeded stub (exact binary
fractions on the 2^-20 grid), clearly marked: swap in a trained
weight list (`weights=`) for production scoring; every line of Spark
plumbing is identical either way.  This is the same stub-the-model,
prove-the-plumbing contract as the multimodal fake decoder.

Engine-exactness: the token→bucket hash is the engine's md5-prefix
integer (dedup.word_ngram_codes' code), grid weights make every
lookup exact, and the score fold is the proven 0.0-seeded
left-to-right double chain (text.doc_lm_score), so the whole scorer
hash-checks against the generated oracle built from the SAME Python
weight list.

Scale (100 TB): per-row expression pipeline inside one codegen stage;
the weight table is a literal (kilobytes — fastText quality heads are
small) so nothing joins, nothing shuffles; a wider learned model would
swap the literal for a broadcast join on bucket id without changing
the query shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _token_col
from .similarity import _array_literal
from .text import _toks_sql


def hashed_classifier_weights(
    dim: int = 1024, seed: int = 42, scale_bits: int = 20
) -> list[float]:
    """Deterministic STUB weight table: ``dim`` values uniform on the
    ``2^-scale_bits`` grid in [-1, 1) from a seeded RNG.  Grid values
    are exact binary fractions, so sums and means are bit-reproducible
    in any engine.  Production use passes a trained list instead."""
    import random

    rng = random.Random(seed)
    scale = 1 << scale_bits
    return [rng.randrange(-scale, scale) / float(scale) for _ in range(dim)]


def classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    seed: int = 42,
    bias: float = 0.0,
    threshold: float = 0.0,
    weights: list[float] | None = None,
    keep_all: bool = False,
) -> DataFrame:
    """Score every document with the hashed linear classifier and flag
    the keep decision: (id, n_tokens, score, clf_pass) — or, with
    ``keep_all=True``, every input column ahead of the three metric
    columns (pure projection, no join — which is what lets the gate
    run unchanged on a STREAM, where a score join-back would be a
    stream-stream self-join).

    ``score = (Σ_tokens w[md5int(token) % dim]) / n_tokens + bias`` —
    the linear margin, deliberately NOT squashed through a sigmoid
    (libm ``exp`` breaks cross-engine bit-equality; thresholding the
    margin is decision-equivalent).  NULL text scores NULL and fails
    the gate as NULL (SQL three-valued logic, identical in both
    engines)."""
    w = weights if weights is not None else hashed_classifier_weights(dim, seed)
    if len(w) != dim:
        raise ValueError(f"classifier_score: got {len(w)} weights for dim={dim}")
    if keep_all:
        clash = sorted(set(df.columns) & {"n_tokens", "score", "clf_pass"})
        if clash:
            raise ValueError(
                f"classifier_score(keep_all=True): input column(s) {clash} "
                "collide with the produced metric names; rename them first"
            )
    w_lit = _array_literal(w)
    toks = _token_col(F.col(text_col))
    per_tok = F.transform(
        toks,
        lambda t: F.element_at(
            w_lit,
            (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % dim)
            .cast("int") + 1,
        ),
    )
    total = F.aggregate(per_tok, F.lit(0.0), lambda a, x: a + x)
    n = F.size(toks)
    score = F.when(
        F.col(text_col).isNotNull(),
        total / n.cast("double") + F.lit(float(bias)),
    )
    lead = [F.col("*")] if keep_all else [F.col(id_col)]
    return df.select(
        *lead,
        F.when(F.col(text_col).isNotNull(), n.cast("bigint")).alias("n_tokens"),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("clf_pass"),
    )


def save_classifier_weights(weights: list[float], path: str, *, spark=None) -> None:
    """Persist a trained weight table as an ARTIFACT the scorer can
    load by path — the missing link between the production-shaped
    plumbing and a production model.  Two formats by extension:

    - ``*.json``: a plain JSON list of ``dim`` floats, written
      driver-side (the natural export of a Python training loop);
    - anything else: parquet ``(bucket int, weight double)`` rows via
      Spark (the natural export of a distributed trainer) — requires
      ``spark``.

    Either way the artifact is kilobytes (fastText-style quality heads
    are small), so the load stays a bounded driver-side read and the
    weights still embed into both the Spark plan and the oracle SQL as
    literals — query shape identical to the stub path."""
    if path.endswith(".json"):
        import json

        with open(path, "w") as f:
            json.dump([float(v) for v in weights], f)
        return
    if spark is None:
        raise ValueError("save_classifier_weights: parquet artifacts need spark")
    rows = [(i, float(v)) for i, v in enumerate(weights)]
    spark.createDataFrame(rows, "bucket int, weight double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_classifier_weights(
    path: str, *, spark=None, dim: int | None = None
) -> list[float]:
    """Load a weight artifact written by :func:`save_classifier_weights`
    (or any trainer emitting the same layout) back into the plain
    Python list :func:`classifier_score` takes.  BOUNDED driver-side
    read — ``dim`` rows/values, kilobytes — validated hard: the bucket
    ids must cover 0..dim-1 exactly once (a sparse or duplicated table
    would silently mis-score every document whose token hashes into
    the hole)."""
    if path.endswith(".json"):
        import json

        with open(path) as f:
            vals = json.load(f)
        if not isinstance(vals, list) or not all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals
        ):
            raise ValueError(
                f"classifier weight artifact {path}: expected a JSON list of numbers"
            )
        w = [float(v) for v in vals]
    else:
        if spark is None:
            raise ValueError("load_classifier_weights: parquet artifacts need spark")
        rows = (
            spark.read.schema("bucket int, weight double")
            .parquet(path)
            .collect()  # bounded: dim rows, kilobytes (docstring contract)
        )
        by_bucket = {}
        for r in rows:
            if r["bucket"] in by_bucket:
                raise ValueError(
                    f"classifier weight artifact {path}: duplicate bucket {r['bucket']}"
                )
            by_bucket[r["bucket"]] = r["weight"]
        n = dim if dim is not None else len(by_bucket)
        missing = [i for i in range(n) if i not in by_bucket]
        extra = sorted(set(by_bucket) - set(range(n)))
        if missing or extra:
            raise ValueError(
                f"classifier weight artifact {path}: buckets must cover 0..{n - 1} "
                f"exactly (missing {missing[:5]}{'…' if len(missing) > 5 else ''}, "
                f"out-of-range {extra[:5]}{'…' if len(extra) > 5 else ''})"
            )
        w = [float(by_bucket[i]) for i in range(n)]
    if dim is not None and len(w) != dim:
        raise ValueError(
            f"classifier weight artifact {path}: got {len(w)} weights for dim={dim}"
        )
    return w


def classifier_score_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    seed: int = 42,
    bias: float = 0.0,
    threshold: float = 0.0,
    weights: list[float] | None = None,
) -> str:
    """DuckDB mirror generated from the SAME weight list: md5-prefix
    bucket, list-literal lookup, 0.0-seeded list_reduce fold, one
    division, same NULL propagation."""
    w = weights if weights is not None else hashed_classifier_weights(dim, seed)
    # Two DuckDB literal traps (both found by the hash check): a bare
    # high-precision decimal literal types as DECIMAL and folds in
    # decimal arithmetic, and CAST(VARCHAR AS DOUBLE) mis-rounds ~10%
    # of 17-digit literals by 1 ulp (measured: 98/1024 of these).
    # Values on the 2^-k grid therefore encode as exact integer
    # divisions (int → double is exact, ÷2^20 is exact); off-grid
    # user weights fall back to the repr cast with its documented
    # 1-ulp parse risk.
    def enc(v: float) -> str:
        k = v * 1048576.0
        if k == int(k) and abs(k) < 2**53:
            return f"(CAST({int(k)} AS DOUBLE) / 1048576.0)"
        return f"CAST({float(v)!r} AS DOUBLE)"

    wl = "[" + ", ".join(enc(float(v)) for v in w) + "]"
    toks = _toks_sql(text_col)
    per_tok = (
        f"list_transform({toks}, t -> wl[CAST(CAST(('0x' || substr(md5(t), 1, 8)) "
        f"AS BIGINT) % {dim} AS INTEGER) + 1])"
    )
    return (
        f"SELECT {id_col}, "
        f"CASE WHEN {text_col} IS NOT NULL THEN CAST(len({toks}) AS BIGINT) END "
        f"AS n_tokens, "
        f"CASE WHEN {text_col} IS NOT NULL THEN "
        f"list_reduce(list_prepend(0.0, {per_tok}), (a, b) -> a + b) "
        f"/ CAST(len({toks}) AS DOUBLE) + {float(bias)!r} END AS score, "
        f"(CASE WHEN {text_col} IS NOT NULL THEN "
        f"list_reduce(list_prepend(0.0, {per_tok}), (a, b) -> a + b) "
        f"/ CAST(len({toks}) AS DOUBLE) + {float(bias)!r} END) >= {float(threshold)!r} "
        f"AS clf_pass "
        f"FROM {table} CROSS JOIN (SELECT {wl} AS wl)"
    )
