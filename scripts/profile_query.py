#!/usr/bin/env python
"""Per-query profiling harness (guide §1): times each named query warm
(noop sink, N reps in one session) and attributes the last rep's time
to physical stages via the UI REST API (executorRunTime, shuffle
read/write bytes, task counts) so optimization targets the real cost,
not a guess.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1 SPARK_GRAFT_CPUS=32 \
        python scripts/profile_query.py ewma grouped_quantiles ...
Flags via env: PROFILE_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openetlagent_spark.plans import HARNESS_QUERIES  # noqa: E402
from openetlagent_spark.session import free_local_checkpoints, get_spark  # noqa: E402


def rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> None:
    names = [a for a in sys.argv[1:] if a in HARNESS_QUERIES]
    unknown = [a for a in sys.argv[1:] if a not in HARNESS_QUERIES]
    if unknown:
        print(f"unknown queries skipped: {unknown}")
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    spark = get_spark("profile-query")
    sc = spark.sparkContext
    results = {}
    for name in names:
        fn = HARNESS_QUERIES[name]
        times = []
        for rep in range(reps):
            free_local_checkpoints(spark)
            sc.setJobGroup(f"prof:{name}:{rep}", f"{name} rep {rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            sc.setJobGroup(None, None)
        results[name] = times
        print(f"\n=== {name}: " + " ".join(f"{t:.2f}s" for t in times))
        # attribute the LAST rep via REST
        try:
            jobs = rest(spark, "/jobs?status=succeeded")
            last = [j for j in jobs if j.get("jobGroup") == f"prof:{name}:{reps-1}"]
            stage_ids = sorted({s for j in last for s in j["stageIds"]})
            rows = []
            for sid in stage_ids:
                for st in rest(spark, f"/stages/{sid}"):
                    if st["status"] != "COMPLETE":
                        continue
                    rows.append((
                        st["executorRunTime"] / 1000.0,
                        sid,
                        st["numCompleteTasks"],
                        st["shuffleReadBytes"] / 1e6,
                        st["shuffleWriteBytes"] / 1e6,
                        st["inputBytes"] / 1e6,
                        (st.get("name") or "")[:70],
                    ))
            rows.sort(reverse=True)
            print(f"  {'runT(s)':>8} {'stage':>5} {'tasks':>5} {'shRd(MB)':>9} "
                  f"{'shWr(MB)':>9} {'in(MB)':>8}  name")
            for r in rows[:12]:
                print(f"  {r[0]:8.2f} {r[1]:5d} {r[2]:5d} {r[3]:9.1f} "
                      f"{r[4]:9.1f} {r[5]:8.1f}  {r[6]}")
        except Exception as exc:  # REST is best-effort
            print(f"  (stage attribution unavailable: {exc})")
    print("\nJSON:", json.dumps({k: round(min(v), 3) for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
