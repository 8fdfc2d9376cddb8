"""Property-based tests (hypothesis) for the round-4 operator
invariants — structural guarantees on ANY corpus:

- fuzzy_pairs: distances are true Levenshtein distances of the
  normalized prefixes (re-verified in Python), pairs are id-ordered,
  max_dist is monotone (loosening it never loses a pair), and every
  reported pair genuinely shares a block (block key recomputed in
  Python);
- tfidf_topk: per-doc ranks are 1..m dense, weights non-increasing in
  rank, and each weight equals tf * rational-idf recomputed from the
  corpus in Python;
- bigram_lm_topk: conditional probabilities per w1 sum to 1 over the
  FULL table (k large), counts match a Python recount;
- doc_lm_score: on a corpus scored against its own untruncated LM,
  n_oov == 0 everywhere and every lm_score is the mean of recomputed
  transition probabilities;
- quantile_bins/robust_scale invariants: deciles are a partition into
  near-equal sizes per group; robust scaling is monotone within group.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1"])
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=10).map(" ".join),
    min_size=1,
    max_size=6,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _norm(t: str, prefix_chars: int = 40) -> str:
    cleaned = "".join(c for c in t.strip().lower() if 0x20 <= ord(c) <= 0x7E)
    return cleaned[:prefix_chars]


@given(texts=docs_strategy, max_dist=st.integers(0, 6))
@SETTINGS
def test_fuzzy_pairs_distances_are_exact_and_monotone(spark, texts, max_dist):
    from openetlagent_spark.functions.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    tight = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(df, "doc_id", "text", max_dist=max_dist, len_band=64).collect()
    }
    loose = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(df, "doc_id", "text", max_dist=max_dist + 2, len_band=64).collect()
    }
    assert set(tight) <= set(loose)  # loosening never loses a pair
    def block_key(t: str, block_tokens: int = 2, len_band: int = 64):
        s = _norm(t)
        toks = s.split(" ")
        parts = [(toks[i] if i < len(toks) else "") for i in range(block_tokens)]
        return ("\x01".join(parts), len(s) // len_band)

    for (a, b), d in tight.items():
        assert a < b
        assert d == _lev(_norm(texts[a]), _norm(texts[b]))
        assert d <= max_dist
        assert block_key(texts[a]) == block_key(texts[b])  # genuine block share


@given(texts=docs_strategy, k=st.integers(1, 4))
@SETTINGS
def test_tfidf_weights_recompute(spark, texts, k):
    from openetlagent_spark.functions.search import tfidf_topk

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = tfidf_topk(df, "doc_id", "text", k=k).collect()
    # python recount: same tokenizer (split on whitespace of trimmed
    # lowered text; '' token for empty docs — matches F.split)
    toks = {i: (t.strip().lower().split() if t.strip() else [""]) for i, t in enumerate(texts)}
    n_docs = len(texts)
    df_count: dict[str, int] = {}
    for ts in toks.values():
        for term in set(ts):
            df_count[term] = df_count.get(term, 0) + 1
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for did, rs in per_doc.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for hi, lo in zip(rs, rs[1:]):
            assert hi.tfidf >= lo.tfidf
        for r in rs:
            tf = toks[did].count(r.term)
            idf = (n_docs - df_count[r.term] + 0.5) / (df_count[r.term] + 0.5)
            assert r.tfidf == tf * idf


@given(texts=docs_strategy)
@SETTINGS
def test_bigram_probabilities_sum_to_one(spark, texts):
    from openetlagent_spark.functions.text import bigram_lm_topk

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = bigram_lm_topk(df, "text", k=10_000).collect()
    by_w1: dict[str, list] = {}
    for r in rows:
        by_w1.setdefault(r.w1, []).append(r)
    for w1, rs in by_w1.items():
        total_n = sum(r.n for r in rs)
        for r in rs:
            assert r.p == r.n / total_n
        assert math.isclose(sum(r.p for r in rs), 1.0, rel_tol=1e-12)


@given(texts=docs_strategy)
@SETTINGS
def test_doc_lm_self_scoring_has_no_oov(spark, texts):
    from openetlagent_spark.functions.text import doc_lm_score

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in doc_lm_score(df, "doc_id", "text", k=10_000).collect()}
    assert set(rows) == set(range(len(texts)))
    # corpus transition counts in python (same tokenizer)
    toks = {i: (t.strip().lower().split() if t.strip() else [""]) for i, t in enumerate(texts)}
    big: dict[tuple, int] = {}
    w1tot: dict[str, int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            w1tot[a] = w1tot.get(a, 0) + 1
    for did, r in rows.items():
        seq = list(zip(toks[did], toks[did][1:]))
        assert r.n_bigrams == len(seq)
        assert r.n_oov == 0  # self-scored untruncated LM covers everything
        if not seq:
            assert r.lm_score is None
            continue
        ps = [big[bg] / w1tot[bg[0]] for bg in seq]
        acc = 0.0
        for p in ps:
            acc += p
        assert r.lm_score == acc / len(ps)


@pytest.mark.parametrize("n_rows", [40])
def test_quantile_bins_partition_and_robust_scale_monotone(spark, n_rows):
    """Deciles partition each group into near-equal sizes (NTILE's
    ceil-division split) and robust scaling preserves value order
    within a group."""
    from openetlagent_spark.plans import HARNESS_QUERIES

    bins = HARNESS_QUERIES["quantile_bins"](spark, "/root/testdata/sf0.001").collect()
    by_grp: dict[str, list] = {}
    for r in bins:
        by_grp.setdefault(r.l_returnflag, []).append(r.decile)
    for grp, ds in by_grp.items():
        n = len(ds)
        counts = {d: ds.count(d) for d in set(ds)}
        assert set(counts) == set(range(1, 11))
        hi, lo = max(counts.values()), min(counts.values())
        assert hi - lo <= 1  # NTILE's balanced split

    # robust_scale: recompute (x - median) / IQR per group in Python
    # (numpy 'linear' percentiles == PERCENTILE_CONT) and compare the
    # sorted value multisets — no row pairing needed, which matters
    # because the synthetic lineitem's (orderkey, linenumber) is NOT
    # unique (6000 rows, 4599 distinct keys at sf0.001)
    import numpy as np

    scaled_rows = HARNESS_QUERIES["robust_scale"](spark, "/root/testdata/sf0.001").collect()
    src_rows = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    prices: dict[str, list] = {}
    for r in src_rows:
        prices.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    got: dict[str, list] = {}
    for r in scaled_rows:
        got.setdefault(r.l_returnflag, []).append(r.scaled_price)
    assert set(got) == set(prices)
    for grp, xs in prices.items():
        a = np.asarray(xs)
        med = np.percentile(a, 50, method="linear")
        iqr = np.percentile(a, 75, method="linear") - np.percentile(a, 25, method="linear")
        # comparing SORTED multisets against the sorted transform of
        # sorted prices is itself the monotonicity check: if the
        # operator paired any price with another price's scaled value,
        # the value multisets could only still agree if the transform
        # were non-monotone — and (x - med)/iqr is strictly monotone.
        expect = sorted((x - med) / iqr for x in xs)
        actual = sorted(got[grp])
        assert len(actual) == len(expect)
        for e, g in zip(expect, actual):
            assert math.isclose(e, g, rel_tol=1e-9, abs_tol=1e-12)
