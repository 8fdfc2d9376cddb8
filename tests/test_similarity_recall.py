"""Recall quality of the approximate similarity paths vs the exact
brute-force baseline, on the driver's real embeddings table at sf0.001.
Uniform random embeddings are the WORST case for LSH (near-uniform
cosines); the floors here are deliberately below the measured values
(~0.7 both) to stay robust."""

from __future__ import annotations

import pytest

from openetlagent_spark.functions.similarity import cosine_topk, ivf_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def brute(spark, emb):
    qs = emb.filter("vec_id < 30")
    return {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qs, k=10).collect()}


def test_lsh_topk_recall_floor(emb, brute):
    qs = emb.filter("vec_id < 30")
    lsh = {(r.query_id, r.neighbor_id) for r in lsh_topk(emb, qs, k=10).collect()}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.5, f"LSH recall@10 collapsed: {recall:.3f}"


def test_ivf_topk_recall_floor(emb, brute):
    qs = emb.filter("vec_id < 30")
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, qs, k=10, n_centroids=8, nprobe=4).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"IVF recall@10 collapsed: {recall:.3f}"


def test_embedding_centroids_match_numpy(spark):
    import numpy as np

    from openetlagent_spark.functions.similarity import embedding_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = embedding_centroids(emb, "label", "embedding").collect()
    data = emb.collect()
    import collections
    by_label = collections.defaultdict(list)
    for r in data:
        by_label[r.label].append(np.array(r.embedding, dtype=np.float64))
    got = {(r.label, r.dim_pos): (r.centroid, r.n_vecs) for r in rows}
    for label, vecs in by_label.items():
        q = np.floor(np.stack(vecs) * (1 << 20)).sum(axis=0)
        want = q / float(1 << 20) / len(vecs)
        for pos in range(len(want)):
            c, n = got[(label, pos)]
            assert n == len(vecs)
            assert abs(c - want[pos]) < 1e-12
