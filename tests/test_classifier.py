"""Hashed linear quality classifier (functions/classifier.py) — the
bulk hash parity runs through the harness oracle; these pin the
contract edges."""

from __future__ import annotations

import pytest

from openetlagent_spark.functions.classifier import (
    classifier_score,
    hashed_classifier_weights,
)


def test_score_matches_python_mirror(spark):
    """The Spark fold equals a plain Python left fold over the same
    md5 buckets — float-for-float."""
    import hashlib

    w = hashed_classifier_weights()
    df = spark.createDataFrame(
        [(1, "the quick Brown fox"), (2, "  padded   text  "), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in classifier_score(df, "doc_id", "text").collect()}

    def pyscore(text):
        toks = __import__("re").split(r"\s+", text.strip().lower())
        acc = 0.0
        for t in toks:
            acc += w[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1024]
        return acc / len(toks)

    assert got[1].score == pyscore("the quick Brown fox")
    assert got[2].score == pyscore("  padded   text  ")
    assert got[2].n_tokens == 2
    assert got[3].score is None and got[3].n_tokens is None
    assert got[3].clf_pass is None  # NULL gate, not False


def test_custom_weights_and_threshold(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "c")], "doc_id long, text string")
    import hashlib

    def b(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4

    w = [0.0] * 4
    w[b("a")] = 1.0
    w[b("b")] = 1.0
    w[b("c")] = -1.0
    got = {
        r.doc_id: r
        for r in classifier_score(
            df, dim=4, weights=w, threshold=0.5
        ).collect()
    }
    assert got[1].score == 1.0 and got[1].clf_pass
    assert got[2].score == -1.0 and not got[2].clf_pass
    with pytest.raises(ValueError, match="weights"):
        classifier_score(df, dim=8, weights=w)


def test_weights_are_grid_exact_and_seeded():
    w1 = hashed_classifier_weights(dim=64, seed=7)
    w2 = hashed_classifier_weights(dim=64, seed=7)
    w3 = hashed_classifier_weights(dim=64, seed=8)
    assert w1 == w2 and w1 != w3
    assert all(v * (1 << 20) == int(v * (1 << 20)) for v in w1)
    assert all(-1.0 <= v < 1.0 for v in w1)


def test_keep_all_and_collision_guard(spark):
    df = spark.createDataFrame([(1, "a b", "s")], "doc_id long, text string, src string")
    out = classifier_score(df, keep_all=True).collect()[0]
    assert set(out.asDict()) == {"doc_id", "text", "src", "n_tokens", "score", "clf_pass"}
    bad = df.withColumnRenamed("src", "score")
    with pytest.raises(ValueError, match="collide"):
        classifier_score(bad, keep_all=True)
