"""Unit tests for the Gopher rule battery and CCNet-style per-language
LM bucketing — the edge cases (NULL/empty text, bullet/ellipsis lines,
stopword distinctness) the documents-table oracle never exercises."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from openetlagent_spark.functions.text import gopher_rules, lm_quality_buckets


@pytest.fixture(scope="module")
def rows(spark):
    data = [
        # clean English prose: passes everything
        Row(doc_id=1, text="the cat and the dog have been to the house of that friend with joy"),
        # empty / null: fail with 0 words
        Row(doc_id=2, text=""),
        Row(doc_id=3, text=None),
        # bullet-dominated
        Row(doc_id=4, text="- one\n- two\n- three\n* four\nplain"),
        # ellipsis-heavy lines
        Row(doc_id=5, text="first...\nsecond...\nthird line"),
        # symbol-heavy (hashes)
        Row(doc_id=6, text="## ## ## ## tags"),
        # numeric gibberish: alpha ratio fails
        Row(doc_id=7, text="12 34 56 78 90 11 22"),
        # repeated single stopword: distinctness means 1 hit only
        Row(doc_id=8, text="the the the the the the"),
    ]
    return spark.createDataFrame(data)


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}

def test_gopher_clean_prose_passes(rows):
    out = _by_id(gopher_rules(rows))
    assert out[1].gopher_pass
    assert out[1].stop_hits >= 2 and out[1].r_alpha


def test_gopher_null_and_empty_fail_with_zero_words(rows):
    out = _by_id(gopher_rules(rows))
    for i in (2, 3):
        assert out[i].n_words == 0 and not out[i].gopher_pass
        assert out[i].mean_word_len is None and out[i].alpha_ratio is None


def test_gopher_bullet_and_ellipsis_ratios(rows):
    out = _by_id(gopher_rules(rows))
    assert out[4].bullet_ratio == pytest.approx(4 / 5)
    assert out[4].r_bullet  # 4/5 <= 0.9 threshold passes
    assert out[5].ellipsis_ratio == pytest.approx(2 / 3)
    assert not out[5].r_ellipsis  # 2/3 > 0.3 threshold


def test_gopher_symbol_and_alpha_rules(rows):
    out = _by_id(gopher_rules(rows))
    assert out[6].symbol_ratio == pytest.approx(8 / 5)  # 8 '#' chars / 5 words
    assert not out[6].r_symbol
    assert out[7].alpha_ratio == 0.0 and not out[7].r_alpha


def test_gopher_stopword_distinctness(rows):
    out = _by_id(gopher_rules(rows))
    assert out[8].stop_hits == 1 and not out[8].r_stop


def test_gopher_threshold_overrides(rows):
    out = _by_id(gopher_rules(rows, min_words=100))
    assert not out[1].r_words and not out[1].gopher_pass


def test_ccnet_buckets_cover_and_split(spark):
    # three langs × many docs with clearly-ranked scores: every language
    # must contain head, middle, and tail rows, and within a language a
    # higher-scoring doc may never land in a lower bucket.
    rng_rows = []
    did = 0
    rank = {"head": 2, "middle": 1, "tail": 0}
    for lang in ("en", "fr", "de"):
        for i in range(12):
            text = " ".join(["alpha beta"] * (i + 1) + ["gamma"] * (12 - i))
            rng_rows.append(Row(doc_id=did, text=text, lang=lang))
            did += 1
    df = spark.createDataFrame(rng_rows)
    out = lm_quality_buckets(df, k=50).collect()
    assert len(out) == 36
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert {r.bucket for r in rs} == {"head", "middle", "tail"}, lang
        rs = sorted(rs, key=lambda r: r.lm_score)
        for a, b in zip(rs, rs[1:]):
            assert rank[b.bucket] >= rank[a.bucket]


def test_ccnet_null_scores_drop(spark):
    # a doc with a single token has no bigram at all → NULL score → dropped
    df = spark.createDataFrame(
        [Row(doc_id=1, text="word", lang="en"),
         Row(doc_id=2, text="two words here two words", lang="en"),
         Row(doc_id=3, text="two words here again", lang="en")]
    )
    out = lm_quality_buckets(df, k=50).collect()
    assert {r.doc_id for r in out} == {2, 3}


def test_gopher_keep_all_rejects_metric_name_collision(spark):
    """keep_all=True with an input column named like a produced
    metric/flag would yield duplicate column names and ambiguous
    downstream references — it must raise SpecError at plan build
    (ADVICE r05)."""
    import pytest

    from openetlagent_spark.functions.text import gopher_rules
    from openetlagent_spark.model import SpecError

    df = spark.createDataFrame(
        [(1, "some text here", True)],
        "doc_id long, text string, gopher_pass boolean",
    )
    with pytest.raises(SpecError, match="gopher_pass"):
        gopher_rules(df, "doc_id", "text", keep_all=True)
    # without keep_all the projection replaces columns — no clash
    out = gopher_rules(df, "doc_id", "text")
    assert out.columns.count("gopher_pass") == 1
