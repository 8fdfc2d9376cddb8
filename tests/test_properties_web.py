"""Property-based tests (hypothesis) for the web-curation family's
structural invariants on ANY url-shaped input, not just the fixtures:

- url_normalize is IDEMPOTENT (normalizing a normalized URL is a
  no-op) — the property that makes it safe to run at any pipeline
  stage without tracking whether it already ran;
- normalization never reintroduces fragments, default ports, or
  tracking params;
- domain_extract's apex is always a suffix of domain, and neither
  carries a port or uppercase;
- domain_quota never emits more than n rows per domain and its output
  is a subset of the input rows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from openetlagent_spark.functions.web import (
    domain_extract,
    domain_quota,
    url_normalize,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

label = st.sampled_from(["Example", "WWW", "blog", "A1", "x"])
scheme = st.sampled_from(["http", "HTTPS", "Http"])
port = st.sampled_from(["", ":80", ":443", ":8080"])
path = st.sampled_from(["", "/", "/A/b", "/p%20q"])
params = st.lists(
    st.sampled_from(
        ["id=1", "utm_source=x", "ref=tw", "q=Spark", "gclid=9", "Page=2", ""]
    ),
    min_size=0,
    max_size=4,
)
frag = st.sampled_from(["", "#f", "#a b"])


@st.composite
def urls(draw):
    host = ".".join(draw(st.lists(label, min_size=1, max_size=4)))
    qs = "&".join(draw(params))
    return (
        f"{draw(scheme)}://{host}{draw(port)}{draw(path)}"
        + (f"?{qs}" if qs else "")
        + draw(frag)
    )


def _norm_all(spark, values):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(values)], "i long, url string")
    return [r.url_norm for r in url_normalize(df, "url").orderBy("i").collect()]


@given(us=st.lists(urls(), min_size=1, max_size=6))
@SETTINGS
def test_url_normalize_idempotent_and_clean(spark, us):
    once = _norm_all(spark, us)
    twice = _norm_all(spark, once)
    assert once == twice
    for n in once:
        assert "#" not in n
        # default ports are scheme-specific: :443 on http (or :80 on
        # https) is a real, non-default port and must survive
        sch = n.split("://", 1)[0]
        hostport = n.split("://", 1)[1].split("/", 1)[0].split("?", 1)[0]
        if sch == "http":
            assert not hostport.endswith(":80")
        if sch == "https":
            assert not hostport.endswith(":443")
        for bad in ("utm_", "gclid=", "fbclid=", "ref="):
            q = n.split("?", 1)[1] if "?" in n else ""
            assert not any(p.startswith(bad.rstrip("=")) and "=" in p
                           for p in q.split("&") if p) or bad not in q
        scheme_part = n.split("://", 1)[0]
        assert scheme_part == scheme_part.lower()


@given(us=st.lists(urls(), min_size=1, max_size=6))
@SETTINGS
def test_domain_extract_invariants(spark, us):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(us)], "i long, url string")
    for r in domain_extract(df, "url").collect():
        assert r.domain == r.domain.lower()
        assert ":" not in r.domain and ":" not in r.apex_domain
        # contract: exactly ONE leading 'www.' label strips — a
        # residual www. implies the original host doubled it
        if r.domain.startswith("www."):
            host = r.url.split("://", 1)[-1].split("/", 1)[0].split("?", 1)[0]
            assert host.lower().startswith("www.www.")
        assert r.domain.endswith(r.apex_domain)
        assert len(r.apex_domain.split(".")) <= 2


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a.com", "b.org", "c.net"]),
            st.integers(0, 50),
            st.one_of(st.none(), st.integers(-5, 5)),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[1],
    ),
    n=st.integers(1, 4),
)
@SETTINGS
def test_domain_quota_invariants(spark, rows, n):
    df = spark.createDataFrame(rows, "domain string, doc_id long, score long")
    kept = domain_quota(df, "domain", "score", n, "doc_id").collect()
    inp = {(r[0], r[1], r[2]) for r in rows}
    per = {}
    for r in kept:
        assert (r.domain, r.doc_id, r.score) in inp  # subset, untouched rows
        per[r.domain] = per.get(r.domain, 0) + 1
    assert all(c <= n for c in per.values())
    # every domain with rows keeps min(n, count) rows
    from collections import Counter

    counts = Counter(r[0] for r in rows)
    for dom, c in counts.items():
        assert per.get(dom, 0) == min(n, c)
