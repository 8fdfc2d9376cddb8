"""Referential / statistical INTEGRITY audits — the release-gate
checks that run over a corpus BEFORE it ships: foreign-key orphan
detection across a star schema, k-anonymity screening of
quasi-identifier combinations, and a Benford first-digit conformance
audit for numeric-fraud / synthetic-data smells.

These complement functions/expectations.py (row-level rules on ONE
table) with the cross-table and distribution-level checks that rules
on a single row cannot express.  Reference analog: the reference's
schema validation (app/etl/validate.py) checks types and presence
only; none of these exist there — they are north-star extensions for
the 100 TB curation pipeline.

Exactness discipline (the repo-wide oracle rules):

- every count is an integer aggregate (order-free, map-side
  combinable);
- ratios are ONE guarded IEEE division of exact integers at the end;
- Benford's expected frequencies are Python-computed ``math.log10``
  literals injected into BOTH the Spark plan (``F.lit``) and the
  generated DuckDB oracle (``repr(float)`` round-trips the double),
  so neither engine evaluates a transcendental at query time;
- squares are spelled ``d*d`` (never ``pow(d, 2)``) — IEEE multiply
  is bit-identical everywhere, library ``pow`` need not be.

Scale shape:

- ``fk_orphans``: per relationship, the child is reduced to a
  key-count histogram FIRST (one keyed exchange over distinct keys,
  not rows), the anti-join then touches |distinct child keys| ×
  |distinct parent keys| — with AQE free to broadcast a small parent
  (nation/region) while the lineitem→orders check stays a key-key
  shuffle anti-join.  Never an all-row join.
- ``k_anonymity``: one group-by over the quasi-identifier tuple.
- ``benford_audit``: one group-by over 9 digit buckets; the grand
  total is a 1-row aggregate broadcast back (the repo's accepted
  1-row scalar crossJoin pattern).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fk_orphans",
    "fk_orphans_oracle_sql",
    "k_anonymity",
    "k_anonymity_oracle_sql",
    "benford_audit",
    "benford_audit_oracle_sql",
]


# ---------------------------------------------------------------------------
# foreign-key orphan audit
# ---------------------------------------------------------------------------


def fk_orphans(relationships: list[dict]) -> DataFrame:
    """Audit a list of foreign-key relationships and return one row per
    relationship: ``(relationship, child_rows, null_keys, orphan_rows,
    orphan_keys)``.

    Each relationship dict:
    ``{"name": str, "child": DataFrame, "child_key": str,
    "parent": DataFrame, "parent_key": str}``.

    Semantics (SQL referential-integrity convention): a NULL child key
    is NOT an orphan (it is counted separately as ``null_keys`` —
    nullable FKs are legal); an orphan is a NON-NULL child key with no
    matching parent key.  ``orphan_rows`` counts child rows,
    ``orphan_keys`` counts distinct violating key values — the second
    number is what you grep the upstream extract for.

    Plan: child → (key, count) histogram → LEFT ANTI join against the
    distinct parent keyset → 1-row aggregate; unioned across
    relationships.  The anti-join runs on pre-aggregated keys, so its
    input is |distinct keys|, not |rows| — at 100 TB the
    lineitem→orders check exchanges the orderkey histogram (already
    ~4× smaller than lineitem) against the orders keyset, and the
    dimension checks (→nation, →region) broadcast.
    """
    if not relationships:
        raise ValueError("fk_orphans: need at least one relationship")
    rows = []
    for rel in relationships:
        name = rel["name"]
        child_key = rel["child_key"]
        parent_key = rel["parent_key"]
        keys = rel["child"].select(F.col(child_key).alias("_x_k"))
        totals = keys.agg(
            F.count(F.lit(1)).alias("child_rows"),
            F.coalesce(
                F.sum(F.col("_x_k").isNull().cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("null_keys"),
        )
        hist = (
            keys.where(F.col("_x_k").isNotNull())
            .groupBy("_x_k")
            .agg(F.count(F.lit(1)).alias("_x_c"))
        )
        parent_keys = (
            rel["parent"]
            .select(F.col(parent_key).alias("_x_k"))
            .where(F.col("_x_k").isNotNull())
            .distinct()
        )
        orphans = hist.join(parent_keys, "_x_k", "left_anti").agg(
            F.coalesce(F.sum("_x_c"), F.lit(0).cast("bigint")).alias("orphan_rows"),
            F.count(F.lit(1)).alias("orphan_keys"),
        )
        # two 1-row frames — the accepted 1-row scalar crossJoin
        rows.append(
            totals.crossJoin(orphans).select(
                F.lit(name).alias("relationship"),
                "child_rows",
                "null_keys",
                "orphan_rows",
                "orphan_keys",
            )
        )
    return reduce(DataFrame.unionByName, rows)


def fk_orphans_oracle_sql(relationships: list[dict]) -> str:
    """DuckDB oracle for :func:`fk_orphans` — same relationship list,
    but with table NAMES (``child_table`` / ``parent_table``) instead
    of DataFrames.  NOT EXISTS mirrors the left-anti join (and is
    NULL-safe on the parent side, unlike NOT IN)."""
    blocks = []
    for rel in relationships:
        name = rel["name"].replace("'", "''")
        ct, ck = rel["child_table"], rel["child_key"]
        pt, pk = rel["parent_table"], rel["parent_key"]
        not_exists = (
            f"NOT EXISTS (SELECT 1 FROM {pt} WHERE {pt}.{pk} = c.{ck})"
        )
        blocks.append(
            f"SELECT '{name}' AS relationship,\n"
            f"       (SELECT COUNT(*) FROM {ct}) AS child_rows,\n"
            f"       (SELECT COUNT(*) FROM {ct} WHERE {ck} IS NULL) AS null_keys,\n"
            f"       (SELECT COUNT(*) FROM {ct} c WHERE c.{ck} IS NOT NULL AND {not_exists}) AS orphan_rows,\n"
            f"       (SELECT COUNT(DISTINCT c.{ck}) FROM {ct} c WHERE c.{ck} IS NOT NULL AND {not_exists}) AS orphan_keys"
        )
    return "\nUNION ALL\n".join(blocks)


# ---------------------------------------------------------------------------
# k-anonymity screen
# ---------------------------------------------------------------------------


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Return the quasi-identifier combinations whose group size is
    below ``k`` — the rows a privacy release would need to suppress or
    generalize.  Output: the quasi columns plus ``group_size``.

    GROUP BY treats NULL as its own group on both engines (SQL
    semantics), so a NULL quasi value forms a bucket like any other.
    One group-by exchange over the quasi tuple; at 100 TB the group
    count is bounded by the quasi-identifier domain product, so the
    post-aggregation filter output is tiny regardless of corpus size.
    """
    if k < 1:
        raise ValueError(f"k_anonymity: k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("k_anonymity: need at least one quasi-identifier column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
    )


def k_anonymity_oracle_sql(table: str, quasi_cols: list[str], k: int) -> str:
    cols = ", ".join(quasi_cols)
    return (
        f"SELECT {cols}, COUNT(*) AS group_size FROM {table} "
        f"GROUP BY {cols} HAVING COUNT(*) < {int(k)}"
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# Benford's law: P(first digit = d) = log10(1 + 1/d).  Computed ONCE
# here in Python; both engines consume the same double literal.
_BENFORD_EXPECTED: dict[int, float] = {
    d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_audit(df: DataFrame, int_col: str) -> DataFrame:
    """First-significant-digit conformance audit of a positive
    INTEGER-valued column (pass monetary values as exact cents — the
    caller does the ``round(x*100)`` cast so no float formatting is
    involved).  Output, one row per digit 1..9:

    ``(digit, obs, obs_frac, expected_frac, chi2_term)``

    where ``chi2_term = (obs - n·p)² / (n·p)`` — summing the column
    gives the χ² statistic against Benford's law (8 degrees of
    freedom), the standard fraud/synthetic-data smell test for
    financial columns.

    The first digit is taken from the integer's decimal string
    (``substring(cast(v as string), 1, 1)``) — pure integer/string
    ops, bit-exact on both engines, no log10 at query time.  Rows with
    NULL or non-positive values are excluded (Benford is defined on
    positive magnitudes).  One 9-bucket group-by; the grand total is
    an unbounded window SUM over the aggregate's ≤9 rows (a deliberate
    empty partitionBy — safe because the windowed input is the digit
    aggregate, never the corpus), so the corpus is scanned exactly
    once.
    """
    from pyspark.sql import Window

    v = F.col(int_col)
    digits = (
        df.where(v.isNotNull() & (v > 0))
        .select(F.substring(v.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(F.col("digit") == d, F.lit(_BENFORD_EXPECTED[d])).otherwise(
            expected
        )
    obs_d = F.col("obs").cast("double")
    n_d = F.col("_x_n").cast("double")
    exp_cnt = n_d * F.col("expected_frac")
    diff = obs_d - exp_cnt
    return (
        digits.withColumn("_x_n", F.sum("obs").over(w))
        .withColumn("expected_frac", expected)
        .select(
            "digit",
            "obs",
            (obs_d / n_d).alias("obs_frac"),
            "expected_frac",
            ((diff * diff) / exp_cnt).alias("chi2_term"),
        )
    )


def benford_audit_oracle_sql(inner_sql: str) -> str:
    """Oracle for :func:`benford_audit`.  ``inner_sql`` must yield one
    column ``v`` (the integer magnitude).  The expected-frequency CASE
    uses the same Python-computed literals (``repr`` round-trips the
    exact double), and the arithmetic tree mirrors the Spark side
    operation-for-operation."""
    case = " ".join(
        f"WHEN digit = {d} THEN {_BENFORD_EXPECTED[d]!r}" for d in range(1, 10)
    )
    return f"""
WITH digits AS (
  SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         COUNT(*) AS obs
  FROM ({inner_sql}) WHERE v IS NOT NULL AND v > 0 GROUP BY 1),
tot AS (SELECT SUM(obs) AS n FROM digits),
e AS (SELECT digit, obs, CASE {case} END AS expected_frac FROM digits)
SELECT digit, obs,
       CAST(obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_frac,
       expected_frac,
       ((CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * expected_frac)
        * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * expected_frac))
       / (CAST(n AS DOUBLE) * expected_frac) AS chi2_term
FROM e, tot
"""


def reconcile_totals(
    parent: DataFrame,
    parent_key: str,
    declared_col: str,
    child: DataFrame,
    child_key: str,
    amount_col: str,
) -> DataFrame:
    """Cross-table TOTAL reconciliation — the finance-closing audit
    ("does every order header total equal the sum of its lines?"):
    one summary row

    ``(n_parents, n_with_children, n_exact_match, n_mismatch,
    max_abs_diff, sum_declared, sum_computed)``

    over INTEGER amounts (pass exact cents — the caller does the
    ``round(x*100)`` casts, the benford_audit convention, so no float
    comparison ever decides a match).  Parents without children count
    in ``n_parents`` only; a NULL declared total is a mismatch (the
    header is wrong by definition when lines exist).

    Shape: child → per-key integer sums (ONE keyed exchange with full
    map-side combine), join to the parent keyset (AQE broadcasts the
    smaller side), then one global aggregate.  Never a row×row join;
    survives 100 TB with the child reduced to |keys| rows first."""
    p = parent.select(
        F.col(parent_key).alias("_x_k"), F.col(declared_col).alias("_x_d")
    )
    c = (
        child.where(F.col(child_key).isNotNull())
        .groupBy(F.col(child_key).alias("_x_k"))
        .agg(F.sum(F.col(amount_col)).cast("long").alias("_x_s"))
    )
    j = p.join(c, "_x_k", "left")
    has = F.col("_x_s").isNotNull()
    match = has & F.col("_x_d").isNotNull() & (F.col("_x_d") == F.col("_x_s"))
    mismatch = has & (F.col("_x_d").isNull() | (F.col("_x_d") != F.col("_x_s")))
    diff = F.abs(F.col("_x_d") - F.col("_x_s"))
    return j.agg(
        F.count(F.lit(1)).alias("n_parents"),
        F.sum(has.cast("bigint")).alias("n_with_children"),
        F.sum(match.cast("bigint")).alias("n_exact_match"),
        F.sum(mismatch.cast("bigint")).alias("n_mismatch"),
        F.coalesce(F.max(F.when(has, diff)), F.lit(0).cast("bigint")).alias(
            "max_abs_diff"
        ),
        F.coalesce(F.sum(F.when(has, F.col("_x_d"))), F.lit(0).cast("bigint")).alias(
            "sum_declared"
        ),
        F.coalesce(F.sum("_x_s"), F.lit(0).cast("bigint")).alias("sum_computed"),
    )


def reconcile_totals_oracle_sql(
    parent_sql: str,
    parent_key: str,
    declared_col: str,
    child_sql: str,
    child_key: str,
    amount_col: str,
) -> str:
    """DuckDB mirror of :func:`reconcile_totals` — identical guard
    order; NULL declared with children = mismatch."""
    return f"""
WITH p AS (SELECT {parent_key} AS k, {declared_col} AS d FROM ({parent_sql})),
c AS (
  SELECT {child_key} AS k, CAST(SUM({amount_col}) AS BIGINT) AS s
  FROM ({child_sql}) WHERE {child_key} IS NOT NULL GROUP BY 1),
j AS (SELECT p.k, p.d, c.s FROM p LEFT JOIN c ON c.k = p.k)
SELECT COUNT(*) AS n_parents,
       CAST(SUM(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_children,
       CAST(SUM(CASE WHEN s IS NOT NULL AND d IS NOT NULL AND d = s THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_match,
       CAST(SUM(CASE WHEN s IS NOT NULL AND (d IS NULL OR d <> s) THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       CAST(COALESCE(MAX(CASE WHEN s IS NOT NULL THEN ABS(d - s) END), 0) AS BIGINT) AS max_abs_diff,
       CAST(COALESCE(SUM(CASE WHEN s IS NOT NULL THEN d END), 0) AS BIGINT) AS sum_declared,
       CAST(COALESCE(SUM(s), 0) AS BIGINT) AS sum_computed
FROM j
"""
