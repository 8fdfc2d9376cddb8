"""Cache-lifetime hygiene: no operator may leak executor storage for
the session.  Every reused intermediate is materialized with an eager
``localCheckpoint`` (never a bare ``persist``), so its blocks free when
the returned DataFrame is garbage-collected.  This test runs the
operators that historically leaked (round-4 VERDICT item 3:
keyword_search_topk, incremental_dedup, plus the dedup/curation/q15
sites found alongside), drops every reference, and asserts the block
manager drains.

The drain is asynchronous (Spark's ContextCleaner unpersists via a
weak-reference queue after JVM GC), so the assertion polls with forced
gc on both sides.
"""

from __future__ import annotations

import gc
import time

from openetlagent_spark.plans import HARNESS_QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Operators whose implementations materialize a reused intermediate.
LEAK_PRONE = [
    "bm25_topk",          # keyword_search_topk base counts
    "inverted_index",     # localCheckpoint since round 4
    "incremental_dedup",  # fingerprinted batch
    "incremental_neardup",  # union-banding pair table
    "dedup_minhash",      # shingle + signature frames
    "dedup_ngram",        # gram-code frame
    "dedup_embedding",    # vector frame
    "contamination",      # shingle-code frame
    "pack_sequences",     # range-partitioned token counts
    "global_shuffle",     # range-partitioned hash frame
    "tpch_q15",           # revenue view
]


def _persistent_ids(spark) -> set[int]:
    ids = set()
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_operators_do_not_leak_cached_blocks(spark):
    # Delta-based: other test modules' long-lived fixtures may hold
    # checkpointed frames for the whole session (legitimately — their
    # blocks free when the fixture is GC'd), so only RDDs cached BY
    # the operators under test may not survive.
    before = _persistent_ids(spark)
    for name in LEAK_PRONE:
        df = HARNESS_QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0
        del df
    # Everything is out of scope: the block manager must drain back to
    # the pre-test set once both GCs run.  Poll up to 30 s (the
    # cleaner is async).
    deadline = time.monotonic() + 30
    leaked = _persistent_ids(spark) - before
    while leaked and time.monotonic() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        leaked = _persistent_ids(spark) - before
    assert not leaked, (
        f"{len(leaked)} cached RDD(s) survived GC — an operator persists "
        "without a GC-tied lifetime (use eager localCheckpoint, not persist)"
    )
