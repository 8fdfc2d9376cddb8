"""URL/domain curation operators (functions/web.py) — edge-case
contract tests; the bulk hash parity runs through the harness oracle
(url_normalize / domain_quota driver rows)."""

from __future__ import annotations

import pytest

from openetlagent_spark.functions.web import (
    domain_extract,
    domain_quota,
    url_normalize,
)


def _norm(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return url_normalize(df, "url").collect()[0]["url_norm"]


@pytest.mark.parametrize(
    ("url", "want"),
    [
        # scheme+host lowercase, path case kept
        ("HTTP://ExAmple.COM/Path/To", "http://example.com/Path/To"),
        # default ports dropped per scheme
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:443/x", "https://a.com/x"),
        # non-default / cross-scheme ports kept
        ("http://a.com:8080/x", "http://a.com:8080/x"),
        ("http://a.com:443/x", "http://a.com:443/x"),
        # fragment stripped
        ("https://a.com/x#frag", "https://a.com/x"),
        ("https://a.com#frag", "https://a.com"),
        # tracking params: leading / middle / trailing / all
        ("https://a.com/?utm_source=x&id=1", "https://a.com/?id=1"),
        ("https://a.com/?id=1&ref=tw&q=Z", "https://a.com/?id=1&q=Z"),
        ("https://a.com/?id=1&gclid=abc", "https://a.com/?id=1"),
        ("https://a.com/p?fbclid=a&utm_medium=m", "https://a.com/p"),
        # param VALUES keep case; names only match anchored
        ("https://a.com/?Q=UtM&utm_x=1", "https://a.com/?Q=UtM"),
        # 'referrer=' is not 'ref=' — kept
        ("https://a.com/?referrer=z", "https://a.com/?referrer=z"),
        # no scheme: fragment-stripped passthrough
        ("not a url#x", "not a url"),
        ("example.com/path", "example.com/path"),
    ],
)
def test_url_normalize_cases(spark, url, want):
    assert _norm(spark, url) == want


@pytest.mark.parametrize(
    ("url", "domain", "apex"),
    [
        ("https://WWW.Sub.Example.COM:443/x", "sub.example.com", "example.com"),
        ("http://example.com/x", "example.com", "example.com"),
        ("https://a.b.c.d.org/", "a.b.c.d.org", "d.org"),
        # bare host, no scheme
        ("www.example.com/path", "example.com", "example.com"),
        # port on subdomain
        ("http://blog.site.io:8080?q=1", "blog.site.io", "site.io"),
    ],
)
def test_domain_extract_cases(spark, url, domain, apex):
    df = spark.createDataFrame([(url,)], "url string")
    row = domain_extract(df, "url").collect()[0]
    assert (row["domain"], row["apex_domain"]) == (domain, apex)


def test_domain_quota_caps_and_orders(spark):
    rows = [
        ("a.com", i, 100 - i) for i in range(10)
    ] + [("b.com", 100, 5), ("b.com", 101, 5)]
    df = spark.createDataFrame(rows, "domain string, doc_id long, score long")
    kept = domain_quota(df, "domain", "score", 3, "doc_id").collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    # a.com: top-3 scores are doc_id 0,1,2 (score desc)
    assert sorted(by_dom["a.com"]) == [0, 1, 2]
    # b.com under cap: all kept; tie broken but both fit
    assert sorted(by_dom["b.com"]) == [100, 101]
    # helper column dropped
    assert set(kept[0].asDict()) == {"domain", "doc_id", "score"}


def test_domain_quota_tie_break(spark):
    rows = [("a.com", i, 7) for i in range(5)]
    df = spark.createDataFrame(rows, "domain string, doc_id long, score long")
    kept = domain_quota(df, "domain", "score", 2, "doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [0, 1]


def test_domain_quota_null_scores_rank_last(spark):
    """NULL order values must lose to real scores (NULLS LAST pinned on
    both engines — Spark asc() alone would rank them FIRST)."""
    rows = [("a.com", 1, None), ("a.com", 2, 5), ("a.com", 3, 1)]
    df = spark.createDataFrame(rows, "domain string, doc_id long, score long")
    kept_desc = {r.doc_id for r in domain_quota(df, "domain", "score", 2, "doc_id").collect()}
    assert kept_desc == {2, 3}
    kept_asc = {
        r.doc_id
        for r in domain_quota(df, "domain", "score", 2, "doc_id", ascending=True).collect()
    }
    assert kept_asc == {2, 3}  # NULL still last even ascending


def test_url_store_recrawl_admission(spark, tmp_path):
    """CommonCrawl-style re-crawl dedup BY NORMALIZED URL: the generic
    fingerprint store keyed on url_norm — a page re-fetched under a
    differently-tracked/cased/fragmented URL is recognized as known,
    while a genuinely new page admits.  Composition of url_normalize
    with the incremental store machinery, no new operator needed."""
    from openetlagent_spark.functions.incremental import (
        build_fingerprint_store,
        dedup_gate_from_store,
    )

    crawl1 = spark.createDataFrame(
        [
            (1, "https://a.com/page?id=1&utm_source=feed"),
            (2, "HTTP://B.org:80/x#top"),
        ],
        "doc_id long, url string",
    )
    c1 = url_normalize(crawl1, "url")
    store = str(tmp_path / "url_store")
    build_fingerprint_store(c1, store, text_col="url_norm")

    crawl2 = spark.createDataFrame(
        [
            (10, "https://a.com/page?utm_medium=rss&id=1"),  # same page, new tracking
            (11, "http://b.org/x"),                          # same page, canonical form
            (12, "https://a.com/other"),                     # new page
        ],
        "doc_id long, url string",
    )
    c2 = url_normalize(crawl2, "url")
    verdicts = {
        r.doc_id: r.is_known
        for r in dedup_gate_from_store(
            c2, spark, store, id_col="doc_id", text_col="url_norm"
        ).collect()
    }
    assert verdicts == {10: True, 11: True, 12: False}
