"""Property tests for the round-5 operators: line_dedup reassembly
invariants and gopher_rules metric bounds — random inputs the fixed
oracle tables never produce."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

line = st.sampled_from(
    ["alpha beta", "- bullet item", "gamma", "", "  ", "shared footer", "x...", "#tag"]
)
doc_text = st.lists(line, min_size=0, max_size=6).map("\n".join)
docs_strategy = st.lists(doc_text, min_size=1, max_size=5)


@given(texts=docs_strategy)
@SETTINGS
def test_line_dedup_identity_when_threshold_exceeds_corpus(spark, texts):
    """max_docs >= number of documents → no line can exceed the
    threshold → every text comes back verbatim with n_removed = 0."""
    from openetlagent_spark.functions.curation import line_dedup

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = {r.doc_id: r for r in line_dedup(df, max_docs=len(texts)).collect()}
    for i, t in enumerate(texts):
        assert out[i].text_clean == t
        assert out[i].n_removed == 0
        assert out[i].n_lines == len(t.split("\n"))


@given(texts=docs_strategy)
@SETTINGS
def test_line_dedup_counts_are_consistent(spark, texts):
    """n_removed = n_lines - surviving lines, removed lines are exactly
    the normalized non-blank lines whose doc-frequency exceeds 1, and
    surviving text is a subsequence of the original lines."""
    from openetlagent_spark.functions.curation import line_dedup

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = {r.doc_id: r for r in line_dedup(df, max_docs=1).collect()}
    # reference computation
    from collections import defaultdict

    docs_per_key: dict[str, set] = defaultdict(set)
    for i, t in enumerate(texts):
        for l in t.split("\n"):
            if l.strip():
                docs_per_key[l.strip().lower()].add(i)
    boiler = {k for k, d in docs_per_key.items() if len(d) > 1}
    for i, t in enumerate(texts):
        src = t.split("\n")
        expect = [l for l in src if not (l.strip() and l.strip().lower() in boiler)]
        assert out[i].text_clean == "\n".join(expect)
        assert out[i].n_lines == len(src)
        assert out[i].n_removed == len(src) - len(expect)


@given(texts=docs_strategy)
@SETTINGS
def test_gopher_metric_bounds(spark, texts):
    """Line-fraction and alpha ratios live in [0, 1]; stop_hits is
    bounded by the stopword list; n_words matches the tokenizer."""
    from openetlagent_spark.functions.text import GOPHER_STOPWORDS, gopher_rules

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    for r in gopher_rules(df).collect():
        for v in (r.bullet_ratio, r.ellipsis_ratio, r.alpha_ratio):
            assert v is None or 0.0 <= v <= 1.0
        assert 0 <= r.stop_hits <= len(GOPHER_STOPWORDS)
        t = texts[r.doc_id]
        # mirror the engine tokenizer EXACTLY: trim strips SPACES only
        # (a trailing newline yields a trailing empty token — the same
        # in Spark split and DuckDB string_split_regex, so the metric
        # is engine-consistent by construction)
        import re

        trimmed = t.strip(" ")
        expect_words = 0 if trimmed == "" else len(re.split(r"\s+", trimmed.lower()))
        assert r.n_words == expect_words
