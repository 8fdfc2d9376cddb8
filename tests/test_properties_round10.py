"""Property tests for the round-10 second-wave operators: FK-orphan
counts vs a brute Python mirror on random child/parent key sets,
k-anonymity vs a Counter, Benford digit bookkeeping, prefix-sum ==
plain-window equivalence under random data, item-similarity vs a brute
set computation, user-streaks vs a per-key Python scan, and the
integer NTILE re-derivation vs Python's reference split — random
inputs the fixed oracle tables never produce."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=12)),
    min_size=1,
    max_size=40,
)


@given(child=keys, parent=st.lists(st.integers(0, 12), max_size=10))
@SETTINGS
def test_fk_orphans_matches_python(spark, child, parent):
    from openetlagent_spark.functions.integrity import fk_orphans

    cdf = spark.createDataFrame([Row(fk=k) for k in child], "fk int")
    pdf = spark.createDataFrame(
        [Row(pk=k) for k in parent] or [Row(pk=None)], "pk int"
    )
    [row] = fk_orphans(
        [{"name": "r", "child": cdf, "child_key": "fk",
          "parent": pdf, "parent_key": "pk"}]
    ).collect()
    pset = set(parent)
    nonnull = [k for k in child if k is not None]
    orphans = [k for k in nonnull if k not in pset]
    assert row.child_rows == len(child)
    assert row.null_keys == len(child) - len(nonnull)
    assert row.orphan_rows == len(orphans)
    assert row.orphan_keys == len(set(orphans))


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.sampled_from("xy")),
                     min_size=1, max_size=40),
       k=st.integers(1, 6))
@SETTINGS
def test_k_anonymity_matches_counter(spark, rows, k):
    from openetlagent_spark.functions.integrity import k_anonymity

    df = spark.createDataFrame([Row(a=a, b=b) for a, b in rows])
    got = {(r.a, r.b): r.group_size
           for r in k_anonymity(df, ["a", "b"], k).collect()}
    ref = {g: n for g, n in Counter(rows).items() if n < k}
    assert got == ref


@given(vals=st.lists(st.one_of(st.none(), st.integers(-5, 10**6)),
                     min_size=1, max_size=50))
@SETTINGS
def test_benford_bookkeeping(spark, vals):
    from openetlagent_spark.functions.integrity import benford_audit

    df = spark.createDataFrame([Row(v=v) for v in vals], "v long")
    rows = benford_audit(df, "v").collect()
    pos = [v for v in vals if v is not None and v > 0]
    ref = Counter(int(str(v)[0]) for v in pos)
    assert {r.digit: r.obs for r in rows} == dict(ref)
    if pos:
        assert sum(r.obs_frac for r in rows) == 1.0 or \
            abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-12


@given(rows=st.lists(st.tuples(st.integers(0, 100), st.integers(-5, 5),
                               st.integers(0, 9)),
                     min_size=1, max_size=60))
@SETTINGS
def test_prefix_sums_match_window(spark, rows):
    from pyspark.sql import Window
    from openetlagent_spark.functions.curation import two_phase_prefix_sums

    # dedupe sort keys so the order is total (ties would make the
    # running sums frame-order dependent in BOTH formulations)
    seen = set()
    uniq = []
    for k, a, b in rows:
        if k not in seen:
            seen.add(k)
            uniq.append((k, a, b))
    df = spark.createDataFrame(uniq, "k int, a int, b int")
    got = {r.k: (r._x_cum_a, r._x_cum_b)
           for r in two_phase_prefix_sums(df, [F.col("k")], ["a", "b"]).collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    ref = {r.k: (r.ca, r.cb)
           for r in df.withColumn("ca", F.sum("a").over(w))
                      .withColumn("cb", F.sum("b").over(w)).collect()}
    assert got == ref


@given(rows=st.lists(st.tuples(st.integers(0, 8), st.sampled_from("pqr")),
                     min_size=1, max_size=40))
@SETTINGS
def test_item_similarity_matches_sets(spark, rows):
    from openetlagent_spark.functions.mining import item_similarity

    df = spark.createDataFrame([Row(u=u, i=i) for u, i in rows])
    got = {(r.item_a, r.item_b): (r.users_both, r.cosine)
           for r in item_similarity(df, "u", "i").collect()}
    users = defaultdict(set)
    for u, i in rows:
        users[i].add(u)
    ref = {}
    items = sorted(users)
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            a, b = items[x], items[y]
            both = len(users[a] & users[b])
            if both:
                ref[(a, b)] = (both, both / math.sqrt(len(users[a]) * len(users[b])))
    assert got == ref


@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 25)),
                     min_size=1, max_size=50))
@SETTINGS
def test_user_streaks_matches_python(spark, rows):
    import datetime as dt
    from openetlagent_spark.functions.timeseries import user_streaks

    base = dt.datetime(1970, 1, 1)
    df = spark.createDataFrame(
        [Row(k=k, ts=base + dt.timedelta(days=d, hours=1)) for k, d in rows]
    )
    got = {r.key: (r.active_days, r.n_streaks, r.longest_streak)
           for r in user_streaks(df, "k").collect()}
    per = defaultdict(set)
    for k, d in rows:
        per[k].add(d)
    ref = {}
    for k, ds in per.items():
        days = sorted(ds)
        streaks = []
        cur = 1
        for prev, nxt in zip(days, days[1:]):
            if nxt == prev + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        ref[k] = (len(days), len(streaks), max(streaks))
    assert got == ref


@given(n=st.integers(1, 400), k=st.integers(1, 12))
@SETTINGS
def test_ntile_expr_matches_reference(spark, n, k):
    """The integer NTILE re-derivation used by quantile_bins /
    rfm_segments / lift_table equals the SQL-standard split: first
    n%k buckets hold ceil(n/k) rows, the rest floor(n/k)."""
    from openetlagent_spark.plans.analytics import _ntile_expr

    df = spark.range(1, n + 1).select(
        F.col("id").alias("_x_rnk"), F.lit(n).alias("_x_n")
    )
    got = [r[0] for r in df.select(_ntile_expr("_x_rnk", "_x_n", k)).collect()]
    q, rem = divmod(n, k)
    ref = []
    for b in range(1, k + 1):
        size = q + 1 if b <= rem else q
        ref.extend([b] * size)
    assert got == ref
