#!/usr/bin/env python
"""Dump .explain("formatted") for the round-13 touched queries to
plans/r13/<query>_<tag>.txt (tag = before|after).

Usage:  SPARK_GRAFT_SF_DIR=... python scripts/explain_r13.py <tag> [outdir]

Run once from the r12 close commit in a worktree (tag=before) and once
from round-13 HEAD (tag=after); the judge checks plan claims in
OPTIMIZATION_r13.md against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openetlagent_spark.plans import HARNESS_QUERIES  # noqa: E402
from openetlagent_spark.session import get_spark  # noqa: E402

TOUCHED = [
    # multimodal codec work (window memory bound, DC-refinement
    # vectorization, segmenter fast path, ndarray stores)
    "jpeg_decode",
    "jpeg_progressive",
    # self-sized LSH n_planes (auto_n_planes ladder)
    "image_neardup",
    "dedup_embedding",
    "semantic_dedup",
    # connected-components init+round-1 fusion + double-step cycles
    "dedup_clusters",
    "dedup_keep_best",
    "fuzzy_dedup",
    # session-2 driver-overhead batch (numpy lloyd, concurrent layer
    # writes, ADC codeword columns, call-site capture off)
    "ann_pq",
    "ann_sq8",
    "ann_store",
    "ann_store_append",
    "ann_ivf_topk",
    "knn_label",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-r13")
    extra = [q for q in sys.argv[3:] if q in HARNESS_QUERIES]
    for name in TOUCHED + extra:
        fn = HARNESS_QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry at this commit")
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
