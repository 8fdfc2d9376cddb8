"""Cross-cluster-layout determinism: the engine's reproducibility
claims say results depend only on (data, parameters) — never on the
partition layout.  The driver's oracle compares one fixed layout; this
suite re-runs the layout-sensitive operators under a DIFFERENT
``spark.sql.shuffle.partitions`` and asserts row-identical results —
the property that makes a 32-core local run predictive of a
1000-executor cluster."""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from openetlagent_spark.plans import HARNESS_QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Operators whose internals touch partition ids, range sampling,
# per-partition windows, collect_list order, or iterative driver state
# — the places layout dependence would hide.
LAYOUT_SENSITIVE = [
    "global_shuffle",      # spark_partition_id + sampled range split
    "curriculum_order",    # same two-phase rank, score-ordered
    "pack_sequences",      # two-phase prefix sums
    "kmeans_clusters",     # iterative centroid state from partial sums
    "dedup_minhash",       # collect_list bucket expansion
    "dedup_clusters",      # iterative label propagation
    "unfold",              # pivot with deterministic FIRST
    "tokenize_ids",        # TakeOrdered vocab boundary + pos gather
    "bpe_train",           # per-round argmax over distributed counts
    "semantic_dedup",      # pairs + components + rank policy
]


@contextmanager
def shuffle_partitions(spark, n: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _rows(spark, name: str):
    return sorted(
        map(tuple, HARNESS_QUERIES[name](spark, SF_DIR).collect())
    )


@pytest.mark.parametrize("name", LAYOUT_SENSITIVE)
def test_results_identical_across_shuffle_layouts(spark, name):
    with shuffle_partitions(spark, 5):
        a = _rows(spark, name)
    with shuffle_partitions(spark, 32):
        b = _rows(spark, name)
    assert a == b, f"{name}: result depends on the shuffle layout"
