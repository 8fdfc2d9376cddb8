"""IVF-PQ (functions/pq.py): codebook fit determinism, encode/serve
roundtrip, ADC-cut recall floor vs the exact brute-force baseline, and
store validation.  Cross-engine exactness of both the fit and the full
serve is covered by the oracle harness rows (pq_codebooks, ann_pq)."""

from __future__ import annotations

import pytest

from openetlagent_spark.functions.pq import (
    ann_pq_from_store,
    build_pq_store,
    fit_pq_codebooks,
)
from openetlagent_spark.functions.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def pq_store(spark, emb, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("pq") / "store")
    build_pq_store(emb, store, n_centroids=8, m=8, k_codes=16,
                   sample_size=256, iters=2)
    return store


def test_fit_deterministic_and_rational(emb):
    """Two fits over the same corpus are identical, and every float
    coordinate is exactly its rational num/den division (the oracle
    embedding contract)."""
    b1, r1 = fit_pq_codebooks(emb, m=8, k_codes=16, iters=2, sample_size=256)
    b2, _ = fit_pq_codebooks(emb, m=8, k_codes=16, iters=2, sample_size=256)
    assert b1 == b2
    assert len(b1) == 8 and all(len(book) == 16 for book in b1)
    assert all(len(cw) == 8 for book in b1 for cw in book)
    for s in range(8):
        for c in range(16):
            for j in range(8):
                num, den = r1[s][c][j]
                assert b1[s][c][j] == num / den


def test_fit_rejects_bad_shapes(emb):
    with pytest.raises(ValueError, match="not divisible"):
        fit_pq_codebooks(emb, m=7)
    with pytest.raises(ValueError, match="exceeds"):
        fit_pq_codebooks(emb, m=8, k_codes=512, sample_size=256)


def test_store_layout_and_compactness(spark, pq_store):
    """lists carry codes (8 small ints), not vectors — the memory
    trade PQ exists for; refine carries the full doubles; codebooks
    persist every fitted word."""
    lists = spark.read.parquet(f"{pq_store}/lists")
    assert set(lists.columns) == {"neighbor_id", "codes", "cid"}
    row = lists.first()
    assert len(row.codes) == 8 and all(0 <= c < 16 for c in row.codes)
    refine = spark.read.parquet(f"{pq_store}/refine")
    assert set(refine.columns) == {"neighbor_id", "cv", "cid"}
    assert lists.count() == refine.count() == 500
    cb = spark.read.parquet(f"{pq_store}/codebooks")
    assert cb.count() == 8 * 16


def test_serve_recall_floor_vs_exact(spark, emb, pq_store):
    """Recall@10 of the ADC-cut + re-rank path against brute-force
    cosine.  Uniform random embeddings are the PQ worst case
    (subspace distances carry little signal), so the floor sits well
    under the measured ~0.42."""
    qs = emb.filter("vec_id < 30")
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qs, k=10).collect()}
    served = ann_pq_from_store(spark, pq_store, qs, k=10, nprobe=4,
                               refine_factor=4)
    got = {(r.query_id, r.neighbor_id) for r in served.collect()}
    recall = len(brute & got) / len(brute)
    assert recall >= 0.25, f"IVF-PQ recall@10 collapsed: {recall:.3f}"


def test_emitted_cosines_are_exact(spark, emb, pq_store):
    """Every (query, neighbor) the serve emits carries the EXACT
    cosine — approximation may drop candidates, never mis-score
    emitted ones."""
    from openetlagent_spark.functions.similarity import cosine_expr
    from pyspark.sql import functions as F

    served = ann_pq_from_store(spark, pq_store, emb.filter("vec_id < 5"),
                               k=5, nprobe=4, refine_factor=4)
    base = emb.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v"))
    joined = (
        served.join(base.withColumnRenamed("vec_id", "query_id")
                    .withColumnRenamed("v", "qv"), "query_id")
        .join(base.withColumnRenamed("vec_id", "neighbor_id")
              .withColumnRenamed("v", "nv"), "neighbor_id")
        .withColumn("want", cosine_expr(F.col("qv"), F.col("nv")))
    )
    rows = joined.collect()
    assert rows and all(r.cosine == r.want for r in rows)


def test_refine_factor_widens_recall(spark, emb, pq_store):
    """A wider ADC cut can only improve (or hold) recall — the cut is
    the only approximation after probing."""
    qs = emb.filter("vec_id < 20")
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qs, k=5).collect()}

    def recall(rf):
        got = {(r.query_id, r.neighbor_id)
               for r in ann_pq_from_store(spark, pq_store, qs, k=5, nprobe=4,
                                          refine_factor=rf).collect()}
        return len(brute & got) / len(brute)

    assert recall(8) >= recall(1)


def test_store_validation(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="not divisible"):
        build_pq_store(emb, str(tmp_path / "bad"), m=7)
    store = str(tmp_path / "halfbuilt")
    build_pq_store(emb, store, n_centroids=8, m=8, k_codes=16,
                   sample_size=256)
    # serving on a different grid is refused (shared header gate)
    with pytest.raises(ValueError, match="scale_bits"):
        ann_pq_from_store(spark, store, emb.limit(1), scale_bits=16)


def test_build_rejects_bad_codebook_shapes(spark, emb, tmp_path):
    """User-supplied codebooks get the same loud shape gate as
    centroids — wrong subspace width would otherwise NULL-pad the
    encode and silently send every vector to code 0."""
    books, _ = fit_pq_codebooks(emb, m=8, k_codes=16, iters=1, sample_size=256)
    with pytest.raises(ValueError, match="does not match m="):
        build_pq_store(emb, str(tmp_path / "a"), m=8, k_codes=8,
                       codebooks=books)
    short = [[cw[:4] for cw in book] for book in books]
    with pytest.raises(ValueError, match="dim/m"):
        build_pq_store(emb, str(tmp_path / "b"), m=8, k_codes=16,
                       codebooks=short)


def test_vector_append_refuses_pq_store(spark, emb, pq_store):
    """append_to_ann_store writes (id, cv) rows — appending those into
    a PQ store's codes-shaped lists would corrupt it silently; the
    meta m/k_codes columns gate it loudly instead."""
    from openetlagent_spark.functions.similarity import append_to_ann_store

    with pytest.raises(ValueError, match="IVF-PQ store"):
        append_to_ann_store(emb.limit(1), pq_store)


def test_shape_gates_fire_before_any_spark_job(spark, emb, tmp_path):
    """Malformed user constants must fail before the corpus-wide
    hash-sample scan (fast-fail) — and wrong-width centroids are
    rejected for both store builders."""
    from openetlagent_spark.functions.similarity import build_ann_store

    bad_width = [[0.0] * 32 for _ in range(16)]  # dim is 64
    with pytest.raises(ValueError, match="coordinates"):
        build_pq_store(emb, str(tmp_path / "a"), centroids=bad_width)
    with pytest.raises(ValueError, match="coordinates"):
        build_ann_store(emb, str(tmp_path / "b"), centroids=bad_width)


def test_plain_store_refused_by_pq_serve(spark, emb, tmp_path):
    from openetlagent_spark.functions.similarity import build_ann_store

    store = str(tmp_path / "plain")
    build_ann_store(emb, store, n_centroids=8, sample_size=256)
    with pytest.raises(ValueError, match="plain ANN store"):
        ann_pq_from_store(spark, store, emb.limit(1))


def test_all_null_corpus_fails_with_meaningful_error(spark, emb, tmp_path):
    """A corpus with no decodable vectors fails at the dimension probe
    with an error naming the vector column — never an unrelated
    parquet schema-inference error from the refine read-back (which
    additionally reads with an explicit schema)."""
    from pyspark.sql import functions as F

    nulls = emb.select("vec_id", F.lit(None).cast("array<double>").alias("embedding"))
    with pytest.raises(ValueError, match="cannot infer embedding dimension"):
        build_pq_store(nulls, str(tmp_path / "empty"))


def test_pq_store_refused_by_vector_serve(spark, emb, pq_store):
    """ann_from_store on a PQ store must fail at the shared gate with
    the store kind named, not deep in analysis on the missing cv."""
    from openetlagent_spark.functions.similarity import ann_from_store

    with pytest.raises(ValueError, match="IVF-PQ store"):
        ann_from_store(spark, pq_store, emb.limit(1))
