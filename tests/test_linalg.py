"""Gram matrix + driver-side PCA (functions/linalg.py): exactness of
the distributed integer Gram vs a numpy mirror, NULL/dim hygiene, the
overflow guard, power iteration vs numpy eigh, and the projection
serving leg.  Cross-engine exactness of the embedding_gram query is
covered by the oracle harness (scripts/check_oracle.py
embedding_gram)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.functions.linalg import (
    embedding_gram,
    gram_matrix,
    pca_project,
    top_eigenvector,
)

DIM = 8


def _vectors(seed=7, n=120, dim=DIM):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: one dominant direction to make PCA meaningful
    base = rng.randn(n, dim) * 0.05
    base[:, 2] += rng.randn(n) * 0.8
    base[:, 5] += base[:, 2] * 0.5
    return base.astype(np.float32)


def _df(spark, vecs, extra_nulls=False):
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    if extra_nulls:
        rows += [Row(vec_id=-1, embedding=None), Row(vec_id=-2, embedding=[1.0, 2.0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gram_matches_numpy_mirror_exactly(spark):
    """The distributed integer Gram == a single-threaded numpy mirror
    of the same quantization, entry for entry (integer exactness —
    partition order cannot matter)."""
    vecs = _vectors()
    got = {(r["i"], r["j"]): r["sum_q"]
           for r in embedding_gram(_df(spark, vecs), "embedding", DIM).collect()}
    q = np.floor(vecs.astype(np.float64) * 2.0**20).astype(np.int64)
    want = q.T @ q
    assert len(got) == DIM * (DIM + 1) // 2
    for (i, j), s in got.items():
        assert i <= j and s == want[i, j], (i, j)


def test_gram_excludes_null_and_wrong_dim(spark):
    vecs = _vectors(n=30)
    with_junk = embedding_gram(_df(spark, vecs, extra_nulls=True), "embedding", DIM)
    clean = embedding_gram(_df(spark, vecs), "embedding", DIM)
    assert sorted(map(tuple, with_junk.collect())) == sorted(map(tuple, clean.collect()))


def test_gram_overflow_guard(spark):
    """A batch whose rows*max|q|^2 cannot fit int64 must raise, not
    wrap (numpy would wrap silently)."""
    big = np.full((8, 4), 2000.0, dtype=np.float32)  # q ~ 2^31 -> q^2 ~ 2^62
    df = _df(spark, big)
    with pytest.raises(Exception, match="overflow|lower q_bits"):
        embedding_gram(df, "embedding", 4, q_bits=20).collect()


def test_gram_arg_guards(spark):
    df = _df(spark, _vectors(n=5))
    with pytest.raises(ValueError, match="dim"):
        embedding_gram(df, "embedding", 0)
    with pytest.raises(ValueError, match="q_bits"):
        embedding_gram(df, "embedding", DIM, q_bits=31)


def test_gram_matrix_assembly():
    rows = [{"i": 0, "j": 0, "sum_q": 4 << 40}, {"i": 0, "j": 1, "sum_q": -(1 << 40)},
            {"i": 1, "j": 1, "sum_q": None}]
    g = gram_matrix(rows, 2)
    assert g[0, 0] == 4.0 and g[0, 1] == -1.0 and g[1, 0] == -1.0 and g[1, 1] == 0.0
    with pytest.raises(ValueError, match="bad index"):
        gram_matrix([{"i": 1, "j": 0, "sum_q": 1}], 2)


def test_power_iteration_matches_eigh(spark):
    """End to end: distributed Gram -> driver eigen == numpy's eigh on
    the same matrix (up to float tolerance), and close to PCA on the
    raw float64 vectors (quantization noise ~2^-20)."""
    vecs = _vectors(n=200)
    rows = embedding_gram(_df(spark, vecs), "embedding", DIM).collect()
    g = gram_matrix(rows, DIM)
    lam, v = top_eigenvector(g)
    wl, wv = np.linalg.eigh(g)
    top = wv[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    assert lam == pytest.approx(float(wl[-1]), rel=1e-9)
    assert np.allclose(v, top, atol=1e-6)
    raw = vecs.astype(np.float64)
    direct = raw.T @ raw / 1.0
    dl, dv = np.linalg.eigh(direct)
    dtop = dv[:, -1]
    if dtop[int(np.argmax(np.abs(dtop)))] < 0:
        dtop = -dtop
    assert np.allclose(v, dtop, atol=1e-4)


def test_top_eigenvector_guards():
    with pytest.raises(ValueError, match="square"):
        top_eigenvector(np.zeros((2, 3)))
    with pytest.raises(ValueError, match="iters"):
        top_eigenvector(np.eye(2), iters=0)
    with pytest.raises(ValueError, match="zero"):
        top_eigenvector(np.zeros((3, 3)))


def test_pca_project_serving_leg(spark):
    """Projection is a plan-literal dot product: values match numpy,
    wrong-dim rows project NULL, and the plan has no exchange."""
    vecs = _vectors(n=40)
    df = _df(spark, vecs, extra_nulls=False)
    comp = [1.0 / math.sqrt(DIM)] * DIM
    out = pca_project(df, "embedding", comp)
    got = {r["vec_id"]: r["pc1"] for r in out.collect()}
    for i, v in enumerate(vecs):
        acc = 0.0
        for a, b in zip([float(x) for x in v], comp):
            acc += a * b
        assert got[i] == acc  # identical left-to-right fold
    short = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    assert pca_project(short, "embedding", comp).collect()[0]["pc1"] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
