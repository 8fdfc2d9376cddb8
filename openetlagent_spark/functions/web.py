"""URL / domain curation operators — the gate real pretraining
pipelines (CCNet, C4, RefinedWeb) run BEFORE any text heuristic:
normalize the URL, extract the domain, and cap documents per domain.

The reference engine (Antix5/OpenETLAgent) has no web vocabulary
(SURVEY §2.2); this extends the engine the way the dedup/text families
do.  Everything here is JVM expressions — string splits, regexp
filters, and one per-domain window; no UDF, no shuffle beyond the
quota window's hash partition on domain.

Normalization contract (url_normalize):

- fragment stripped (``#...``);
- scheme and host lowercased (paths keep their case — case-sensitive
  by RFC 3986);
- default ports dropped (``:80`` for http, ``:443`` for https);
- tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``, ``mc_cid``, ``mc_eid`` — the C4/RefinedWeb blocklist
  shape), remaining params kept in their original order; a query
  string that empties loses its ``?``;
- URLs with no ``://`` pass through fragment-stripped (the operator
  normalizes web URLs, it does not validate them).

Domain contract (domain_extract): host minus any port and a leading
``www.``; ``apex_domain`` is the last two labels (a deliberate
public-suffix-list simplification — documented, deterministic, and the
right granularity for per-domain caps on synthetic/test corpora; swap
in a PSL lookup table join for production TLDs like ``.co.uk``).

Every step is mirrored 1:1 by the ``*_oracle_sql`` generators (same
split/regexp/CASE chain in DuckDB syntax), so the whole family
hash-checks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# anchored: a param is dropped only when its NAME matches
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref|mc_cid|mc_eid)="


def url_normalize(
    df: DataFrame, url_col: str, out_col: str = "url_norm"
) -> DataFrame:
    """Append ``out_col`` holding the normalized URL (contract in the
    module docstring).  Pure projection — no shuffle."""
    u1 = F.substring_index(F.col(url_col), "#", 1)  # fragment off
    has_scheme = F.instr(u1, "://") > 0
    scheme = F.lower(F.substring_index(u1, "://", 1))
    rest = F.expr(
        f"substring(substring_index({url_col}, '#', 1), "
        f"instr(substring_index({url_col}, '#', 1), '://') + 3)"
    )
    hostport_raw = F.regexp_extract(rest, "^([^/?]*)", 1)
    hostport = F.lower(F.col("__x_hostraw"))
    tail = F.expr(
        # everything after host:port — sliced by the RAW hostport's
        # length: lowercasing can change string length for some Unicode
        # mappings, so indexing rest by the lowered length would drop
        # or duplicate a character of the path
        "substring(__x_rest, length(__x_hostraw) + 1)"
    )
    host_noport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.expr("substring(__x_hostport, 1, length(__x_hostport) - 3)"),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.expr("substring(__x_hostport, 1, length(__x_hostport) - 4)"),
    ).otherwise(hostport)
    path = F.substring_index(F.col("__x_tail"), "?", 1)
    qs = F.when(
        F.instr(F.col("__x_tail"), "?") > 0,
        F.expr("substring(__x_tail, instr(__x_tail, '?') + 1)"),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(F.col("__x_qs"), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    norm = F.concat(
        F.col("__x_scheme"),
        F.lit("://"),
        F.col("__x_hostnp"),
        F.col("__x_path"),
        F.when(
            F.size(F.col("__x_params")) > 0,
            F.concat(F.lit("?"), F.array_join(F.col("__x_params"), "&")),
        ).otherwise(F.lit("")),
    )
    out = (
        df.withColumn("__x_rest", rest)
        .withColumn("__x_scheme", scheme)
        .withColumn("__x_hostraw", hostport_raw)
        .withColumn("__x_hostport", hostport)
        .withColumn("__x_tail", tail)
        .withColumn("__x_hostnp", host_noport)
        .withColumn("__x_path", path)
        .withColumn("__x_qs", qs)
        .withColumn("__x_params", params)
        .withColumn(out_col, F.when(has_scheme, norm).otherwise(u1))
    )
    return out.drop(
        "__x_rest", "__x_scheme", "__x_hostraw", "__x_hostport", "__x_tail",
        "__x_hostnp", "__x_path", "__x_qs", "__x_params",
    )


def domain_extract(
    df: DataFrame,
    url_col: str,
    domain_col: str = "domain",
    apex_col: str = "apex_domain",
) -> DataFrame:
    """Append ``domain_col`` (lowercased host, no port, no leading
    ``www.``) and ``apex_col`` (last two labels) derived from a URL
    column.  Pure projection."""
    u1 = F.substring_index(F.col(url_col), "#", 1)
    rest = F.when(F.instr(u1, "://") > 0, F.expr(
        f"substring(substring_index({url_col}, '#', 1), "
        f"instr(substring_index({url_col}, '#', 1), '://') + 3)"
    )).otherwise(u1)
    host = F.substring_index(
        F.lower(F.regexp_extract(rest, "^([^/?]*)", 1)), ":", 1
    )
    domain = F.when(
        host.startswith("www."), F.expr(f"substring({'__x_host'}, 5)")
    ).otherwise(F.col("__x_host"))
    labels = F.split(F.col(domain_col), "\\.")
    apex = F.when(
        F.size(labels) <= 2, F.col(domain_col)
    ).otherwise(
        F.concat(
            F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
        )
    )
    return (
        df.withColumn("__x_host", host)
        .withColumn(domain_col, domain)
        .withColumn(apex_col, apex)
        .drop("__x_host")
    )


def domain_quota(
    df: DataFrame,
    domain_col: str,
    order_col: str,
    n_per_domain: int,
    tie_col: str,
    ascending: bool = False,
) -> DataFrame:
    """Keep the top ``n_per_domain`` rows of every domain by
    ``order_col`` (descending by default — "best quality first"), ties
    broken by ``tie_col`` ascending.  The RefinedWeb/C4 per-domain cap:
    stops a single crawl-heavy domain from dominating the corpus.

    Scale: ONE hash shuffle on domain; under AQE each partition keeps a
    bounded top-n heap per domain (rank window + filter), so skewed
    mega-domains cost memory proportional to n, not to their row
    count."""
    # explicit NULL placement: Spark asc() defaults NULLS FIRST while
    # DuckDB ASC defaults NULLS LAST — pin NULLS LAST in both directions
    # (and in the generated SQL) so the kept sets can never diverge
    order = (
        F.col(order_col).asc_nulls_last()
        if ascending
        else F.col(order_col).desc_nulls_last()
    )
    w = Window.partitionBy(domain_col).orderBy(order, F.col(tie_col).asc_nulls_last())
    return (
        df.withColumn("__x_rn", F.row_number().over(w))
        .filter(F.col("__x_rn") <= n_per_domain)
        .drop("__x_rn")
    )


# --- DuckDB oracle mirrors -------------------------------------------------


def url_normalize_oracle_sql(url_expr: str) -> str:
    """SELECT-fragment expression mirroring url_normalize for a URL
    SQL expression — same split/regexp/CASE chain in DuckDB syntax.
    Returns a scalar SQL expression string (nest it in a SELECT)."""
    # each binding level becomes a nested-subquery alias in the caller;
    # here we inline via DuckDB lambdas-free string ops only
    u1 = f"split_part({url_expr}, '#', 1)"
    rest = f"substring({u1}, strpos({u1}, '://') + 3)"
    scheme = f"lower(split_part({u1}, '://', 1))"
    hostport_raw = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    hostport = f"lower({hostport_raw})"
    # slice by the RAW hostport length (mirrors the Spark side:
    # lowercasing can change string length for some Unicode mappings)
    tail = f"substring({rest}, length({hostport_raw}) + 1)"
    host_noport = (
        f"CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substring({hostport}, 1, length({hostport}) - 3) "
        f"WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substring({hostport}, 1, length({hostport}) - 4) "
        f"ELSE {hostport} END"
    )
    path = f"split_part({tail}, '?', 1)"
    qs = (
        f"CASE WHEN strpos({tail}, '?') > 0 "
        f"THEN substring({tail}, strpos({tail}, '?') + 1) ELSE '' END"
    )
    params = (
        f"list_filter(string_split({qs}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))"
    )
    norm = (
        f"{scheme} || '://' || {host_noport} || {path} || "
        f"(CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END)"
    )
    return f"CASE WHEN strpos({u1}, '://') > 0 THEN {norm} ELSE {u1} END"


def domain_extract_oracle_sql(url_expr: str) -> tuple[str, str]:
    """(domain_expr, apex_expr) mirroring domain_extract."""
    u1 = f"split_part({url_expr}, '#', 1)"
    rest = (
        f"CASE WHEN strpos({u1}, '://') > 0 "
        f"THEN substring({u1}, strpos({u1}, '://') + 3) ELSE {u1} END"
    )
    host = f"split_part(lower(regexp_extract({rest}, '^([^/?]*)', 1)), ':', 1)"
    domain = (
        f"CASE WHEN {host} LIKE 'www.%' THEN substring({host}, 5) "
        f"ELSE {host} END"
    )
    labels = f"string_split({domain}, '.')"
    apex = (
        f"CASE WHEN len({labels}) <= 2 THEN {domain} "
        f"ELSE {labels}[-2] || '.' || {labels}[-1] END"
    )
    return domain, apex


def domain_quota_oracle_sql(
    inner_sql: str,
    domain_col: str,
    order_col: str,
    n_per_domain: int,
    tie_col: str,
    select_cols: list[str],
    ascending: bool = False,
) -> str:
    """DuckDB mirror of domain_quota over ``inner_sql``'s result."""
    direction = "ASC" if ascending else "DESC"
    cols = ", ".join(select_cols)
    return (
        f"SELECT {cols} FROM (SELECT *, row_number() OVER ("
        f"PARTITION BY {domain_col} ORDER BY {order_col} {direction} NULLS LAST, "
        f"{tie_col} ASC NULLS LAST) AS __rn FROM ({inner_sql})) WHERE __rn <= {n_per_domain}"
    )
