"""Unit tests for the round-4 operator additions: blocked Levenshtein
pair joins (functions/fuzzy.py), per-doc TF-IDF top-k, and bigram-LM
transition counts — each on a constructed corpus with hand-computed
expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from openetlagent_spark.functions.fuzzy import fuzzy_pairs
from openetlagent_spark.functions.search import tfidf_topk
from openetlagent_spark.functions.text import bigram_lm_topk


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="acme widgets inc"),
            Row(doc_id=2, text="acme widgets incx"),   # dist 1 to #1
            Row(doc_id=3, text="acme widgets corp"),   # dist 4 to #1 (inc->corp)
            Row(doc_id=4, text="zeta gadgets inc"),    # different block
            Row(doc_id=5, text=None),
        ]
    )


def test_fuzzy_pairs_finds_close_names(spark, names):
    rows = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(names, "doc_id", "text", max_dist=4, len_band=64).collect()
    }
    assert rows[(1, 2)] == 1
    assert rows[(1, 3)] == 4  # inc -> corp: 1 sub + 3... levenshtein computed
    assert (1, 4) not in rows  # different leading-token block
    assert all(a < b for a, b in rows)


def test_fuzzy_pairs_respects_max_dist(spark, names):
    rows = {(r.id_a, r.id_b) for r in fuzzy_pairs(names, "doc_id", "text", max_dist=1, len_band=64).collect()}
    assert rows == {(1, 2)}


def test_fuzzy_pairs_bucket_cap_drops_block(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=f"same block x{i}") for i in range(10)])
    # cap below the block size: the whole block is dropped, zero pairs
    assert fuzzy_pairs(df, "doc_id", "text", max_dist=64, max_bucket=5, len_band=64).count() == 0


def test_fuzzy_pairs_blocks_distinguish_token_boundaries(spark):
    # 'ab c' and 'a bc' must land in DIFFERENT blocks (x01-joined keys)
    df = spark.createDataFrame(
        [Row(doc_id=1, text="ab c tail"), Row(doc_id=2, text="a bc tail")]
    )
    assert fuzzy_pairs(df, "doc_id", "text", max_dist=64, len_band=64).count() == 0


def test_fuzzy_pairs_rejects_bad_params(spark, names):
    with pytest.raises(ValueError):
        fuzzy_pairs(names, "doc_id", "text", max_dist=-1)
    with pytest.raises(ValueError):
        fuzzy_pairs(names, "doc_id", "text", len_band=0)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="cherry cherry durian"),
        ]
    )


def test_tfidf_rare_term_tops_its_doc(corpus):
    rows = [r for r in tfidf_topk(corpus, "doc_id", "text", k=1).collect()]
    by_doc = {r.doc_id: r for r in rows}
    # durian: df=1 → idf (3-1+.5)/(1+.5) = 5/3, beats cherry (df=2) even at tf=2
    assert by_doc[3].term == "durian"
    # apple: tf=2 and df=1 dominates doc 1
    assert by_doc[1].term == "apple"
    assert all(r.rank == 1 for r in rows)


def test_tfidf_rank_is_dense_per_doc(corpus):
    rows = tfidf_topk(corpus, "doc_id", "text", k=5).collect()
    doc1 = sorted([r.rank for r in rows if r.doc_id == 1])
    assert doc1 == [1, 2]  # two distinct terms only
    # weights non-increasing in rank
    w = {r.rank: r.tfidf for r in rows if r.doc_id == 1}
    assert w[1] >= w[2]


def test_tfidf_rejects_bad_k(corpus):
    with pytest.raises(ValueError):
        tfidf_topk(corpus, "doc_id", "text", k=0)


def test_bigram_counts_and_probabilities(corpus):
    rows = {(r.w1, r.w2): r for r in bigram_lm_topk(corpus, "text", k=50).collect()}
    # corpus bigrams: (apple,banana) (banana,apple) (banana,cherry)
    #                 (cherry,cherry) (cherry,durian)
    assert rows[("apple", "banana")].n == 1
    assert rows[("banana", "apple")].n == 1
    assert rows[("banana", "cherry")].n == 1
    assert rows[("cherry", "cherry")].n == 1
    # banana starts 2 bigrams → p = 1/2 each
    assert rows[("banana", "cherry")].p == 0.5
    assert rows[("cherry", "durian")].p == 0.5
    assert rows[("apple", "banana")].p == 1.0


def test_bigram_topk_orders_by_count_then_lexicographic(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b a b z z")]
    )
    rows = bigram_lm_topk(df, "text", k=2).collect()
    assert (rows[0].w1, rows[0].w2, rows[0].n) == ("a", "b", 3)
    assert (rows[1].w1, rows[1].w2, rows[1].n) == ("b", "a", 2)


def test_single_token_docs_produce_no_bigrams(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="lonely"), Row(doc_id=2, text="")])
    assert bigram_lm_topk(df, "text", k=10).count() == 0


def test_flow_ops_dispatch(spark, corpus, names):
    """fuzzy_pairs / tfidf / bigram_lm specs parse and dispatch to the
    same plans as the direct function calls."""
    from openetlagent_spark.model import parse_operation
    from openetlagent_spark.operators import OPERATION_DISPATCHER

    for spec, direct in [
        (
            {"operation_type": "fuzzy_pairs", "max_dist": 4, "len_band": 64},
            fuzzy_pairs(names, "doc_id", "text", max_dist=4, len_band=64),
        ),
        (
            {"operation_type": "tfidf", "k": 2},
            tfidf_topk(corpus, "doc_id", "text", k=2),
        ),
        (
            {"operation_type": "bigram_lm", "k": 10},
            bigram_lm_topk(corpus, "text", k=10),
        ),
    ]:
        op = parse_operation(spec)
        src = names if spec["operation_type"] == "fuzzy_pairs" else corpus
        got = OPERATION_DISPATCHER[op.operation_type](src, op)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))


def test_dedup_strategy_fuzzy_modes(spark, names):
    """strategy='fuzzy' plugs into the dedup dispatch: pairs mode
    returns the fuzzy pair table; drop removes lower-id partners;
    cluster_drop keeps one survivor per transitive cluster."""
    from openetlagent_spark.model import parse_operation
    from openetlagent_spark.operators import OPERATION_DISPATCHER

    pairs_op = parse_operation({"operation_type": "dedup", "strategy": "fuzzy",
                                "id_column": "doc_id", "text_column": "text",
                                "max_dist": 4, "mode": "pairs"})
    pairs = OPERATION_DISPATCHER["dedup"](names, pairs_op).collect()
    assert {(r.id_a, r.id_b) for r in pairs} >= {(1, 2)}

    drop_op = parse_operation({"operation_type": "dedup", "strategy": "fuzzy",
                               "id_column": "doc_id", "text_column": "text",
                               "max_dist": 4, "mode": "drop"})
    kept = {r.doc_id for r in OPERATION_DISPATCHER["dedup"](names, drop_op).collect()}
    assert 1 in kept and 2 not in kept  # 2 has lower-id partner 1
    assert 4 in kept and 5 in kept      # different block / null text survive


def test_doc_lm_score_self_corpus(spark):
    """On a corpus scored against its own UNtruncated LM, every doc's
    transitions are in-LM (n_oov=0) and scores reflect transition
    concentration; truncation to k=1 makes rarer transitions OOV."""
    from openetlagent_spark.functions.text import doc_lm_score

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b"),     # transitions: ab, ba, ab
            Row(doc_id=2, text="a b c"),       # ab, bc
            Row(doc_id=3, text="solo"),        # no bigrams
        ]
    )
    full = {r.doc_id: r for r in doc_lm_score(df, "doc_id", "text", k=100).collect()}
    assert full[1].n_bigrams == 3 and full[1].n_oov == 0
    assert full[3].n_bigrams == 0 and full[3].lm_score is None
    # p(b|a)=2/3 (a->b twice, a->? three... a starts: ab,ab = 2, plus none else
    # from doc2's ab: a->b 3 times total, no other a-starts → p(b|a)=1.0
    # b-starts: ba (1), bc (1) → p=0.5 each
    assert abs(full[1].lm_score - (1.0 + 0.5 + 1.0) / 3) < 1e-12
    trunc = {r.doc_id: r for r in doc_lm_score(df, "doc_id", "text", k=1).collect()}
    # only the most frequent bigram (ab, n=3) stays in the LM
    assert trunc[2].n_oov == 1 and trunc[2].n_bigrams == 2
    assert trunc[2].lm_score == 1.0  # the surviving ab transition


def test_doc_lm_score_rejects_bad_k(spark):
    from openetlagent_spark.functions.text import doc_lm_score

    df = spark.createDataFrame([Row(doc_id=1, text="x y")])
    with pytest.raises(ValueError):
        doc_lm_score(df, "doc_id", "text", k=0)


def test_doc_lm_score_flow_dispatch(spark, corpus):
    from openetlagent_spark.functions.text import doc_lm_score
    from openetlagent_spark.model import parse_operation
    from openetlagent_spark.operators import OPERATION_DISPATCHER

    op = parse_operation({"operation_type": "doc_lm_score", "k": 100})
    got = OPERATION_DISPATCHER["doc_lm_score"](corpus, op)
    direct = doc_lm_score(corpus, "doc_id", "text", k=100)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))
    import pytest as _pytest

    with _pytest.raises(Exception):
        parse_operation({"operation_type": "doc_lm_score", "k": 0})


# --- fuzzy_block_stats + bounded verifier (round 10) --------------------------


def test_fuzzy_block_stats_counts_dropped_mass(spark):
    """The one-row diagnostic reports exactly what the cap excludes:
    an over-cap block contributes dropped_blocks/dropped_rows and NO
    candidate pairs; surviving blocks contribute C(n,2)."""
    from pyspark.sql import Row

    from openetlagent_spark.functions.fuzzy import fuzzy_block_stats, fuzzy_pairs

    rows = [Row(doc_id=i, text=f"common prefix tail{i}") for i in range(6)]
    rows += [Row(doc_id=100 + i, text=f"other block v{i}") for i in range(3)]
    rows += [Row(doc_id=500 + i, text="qq") for i in range(4)]  # over-cap block
    df = spark.createDataFrame(rows)
    stats = fuzzy_block_stats(df, max_bucket=3).collect()[0]
    assert stats.n_rows == 13
    assert stats.max_block == 6
    # blocks of 6 and 4 exceed max_bucket=3 -> dropped; block of 3 survives
    assert stats.dropped_blocks == 2 and stats.dropped_rows == 10
    assert stats.candidate_pairs == 3  # C(3,2)
    # and fuzzy_pairs with the same cap generates pairs ONLY from the
    # surviving block — the diagnostic predicts the verifier volume
    pairs = fuzzy_pairs(df, max_bucket=3, max_dist=8).collect()
    assert {(p.id_a, p.id_b) for p in pairs} <= {(100, 101), (100, 102), (101, 102)}


def test_fuzzy_bounded_verifier_matches_unbounded(spark):
    """The threshold levenshtein changes cost, never results: same
    surviving pairs, same exact distances as the full-matrix form."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from openetlagent_spark.functions.fuzzy import fuzzy_pairs

    rows = [
        Row(doc_id=1, text="the quick brown fox jumps"),
        Row(doc_id=2, text="the quick brown fox jumped"),
        Row(doc_id=3, text="the quick brown cat sleeps"),
        Row(doc_id=4, text="the quick XXXXXXXXXXXXXXXXXXXXXXXXXXXX"),
    ]
    df = spark.createDataFrame(rows)
    got = {(r.id_a, r.id_b): r.dist for r in fuzzy_pairs(df, max_dist=8).collect()}
    # unbounded reference over the same normalized prefixes
    from openetlagent_spark.functions.fuzzy import _norm_prefix

    base = df.select(F.col("doc_id").alias("id"), _norm_prefix(F.col("text"), 40).alias("s"))
    ref = (
        base.alias("a")
        .join(base.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s").alias("dist"),
        )
        .filter(F.col("dist") <= 8)
    )
    want = {(r.id_a, r.id_b): r.dist for r in ref.collect()}
    # blocking may drop cross-block pairs; every emitted pair must match
    # the unbounded distance exactly, and the in-block survivors agree
    assert got == {k: v for k, v in want.items() if k in got}
    assert (1, 2) in got and got[(1, 2)] == want[(1, 2)]


def test_fuzzy_block_stats_empty_corpus_reports_zeros(spark):
    from pyspark.sql import Row

    from openetlagent_spark.functions.fuzzy import fuzzy_block_stats

    df = spark.createDataFrame([Row(doc_id=1, text=None)], "doc_id long, text string")
    stats = fuzzy_block_stats(df).collect()[0]
    assert (
        stats.n_rows,
        stats.n_blocks,
        stats.max_block,
        stats.dropped_blocks,
        stats.dropped_rows,
        stats.candidate_pairs,
    ) == (0, 0, 0, 0, 0, 0)
