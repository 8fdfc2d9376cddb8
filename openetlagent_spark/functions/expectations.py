"""Row-level data-quality EXPECTATIONS — the Great-Expectations-shaped
assertion battery the engine's schema validation (validate.py — types
and presence only) stops short of: declare per-column rules, get back
per-rule violation counts (audit), per-row flags (quarantine routing),
or a loud failure (circuit breaker).

Rule vocabulary (one dict per rule):

- ``{"column": c, "check": "not_null"}`` — violation: value IS NULL;
- ``{"column": c, "check": "min", "value": v}`` — violation: < v
  (NULL is NOT a violation here — that is not_null's job; SQL
  three-valued comparison semantics, identical in both engines);
- ``{"column": c, "check": "max", "value": v}`` — violation: > v;
- ``{"column": c, "check": "in_set", "values": [...]}`` — violation:
  a NON-NULL value outside the set;
- ``{"column": c, "check": "regex", "pattern": p}`` — violation: a
  non-null value NOT matching; keep patterns in the Java/RE2 shared
  subset (no lookaround) — the repo's cross-engine regex rule;
- ``{"column": c, "check": "unique"}`` — violations: the surplus
  duplicate rows, ``COUNT(c) - COUNT(DISTINCT c)`` (NULLs ignored,
  SQL UNIQUE semantics).  Aggregate-shaped, so it appears in the
  summary but not in per-row annotation.

Exactness discipline: every count is a conditional INTEGER sum
(order-free), the rate is one guarded IEEE division, and the summary
is ONE global aggregate — map-side partial aggregation reduces the
corpus to a single row of counters per partition before the 1-row
final exchange, then the per-rule rows explode OUT of that single row
(no per-rule scans, no joins).  Each ``unique`` rule adds one
distinct-key exchange for its COUNT(DISTINCT) — the one rule shape
whose state is a key set, not a counter.  The DuckDB oracle is generated from
the same rule list so the two cannot drift.

Scale: one scan and one 1-row exchange regardless of how many
per-row rules there are (plus one distinct-key exchange per ``unique``
rule);
``annotate`` is a pure projection (zero shuffle); ``enforce`` is the
same projection with a raise_error branch — the strict-cast contract
(fails at materialization, names the rule and the value).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PER_ROW_CHECKS = ("not_null", "min", "max", "in_set", "regex", "expr")
AGG_CHECKS = ("unique",)
SEVERITIES = ("fail", "warn")


def _rule_base_id(rule: dict) -> str:
    if rule["check"] == "expr":
        return f"{rule['name']}:expr"
    return f"{rule['column']}:{rule['check']}"


def _sql_lit(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        # exact dyadic-grid encoding lives in classifier._enc_double;
        # expectations thresholds are user-chosen constants, so route
        # through the same encoder for bit-stable literals
        from .classifier import _enc_double

        return _enc_double(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def validate_rules(rules: list[dict]) -> list[dict]:
    """Normalize + validate the rule list (shared by the library entry
    points, the flow op, and the oracle generator)."""
    if not rules:
        raise ValueError("expectations: at least one rule is required")
    out = []
    seen_content = set()
    id_counts: dict[str, int] = {}
    for i, r in enumerate(rules):
        if not isinstance(r, dict) or "check" not in r:
            raise ValueError(
                f"expectations rule #{i} must be a dict with a check, got {r!r}"
            )
        check = r["check"]
        if check not in PER_ROW_CHECKS + AGG_CHECKS:
            raise ValueError(
                f"expectations rule #{i}: unknown check {check!r} "
                f"(valid: {sorted(PER_ROW_CHECKS + AGG_CHECKS)})"
            )
        if check == "expr":
            # cross-column boolean expression in the shared
            # Spark-SQL/DuckDB subset (the regex-pattern contract:
            # the author keeps to portable functions); named so the
            # rule id stays meaningful
            if not r.get("expr") or not isinstance(r.get("expr"), str):
                raise ValueError(f"expectations rule #{i}: expr needs 'expr'")
            if ";" in r["expr"]:
                raise ValueError(
                    f"expectations rule #{i}: expr must be a single boolean "
                    "expression (no ';')"
                )
            import re as _re

            if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", str(r.get("name", ""))):
                raise ValueError(
                    f"expectations rule #{i}: expr needs a bare-identifier 'name'"
                )
        elif "column" not in r:
            raise ValueError(
                f"expectations rule #{i} must name a column (got {r!r})"
            )
        if check in ("min", "max") and "value" not in r:
            raise ValueError(f"expectations rule #{i}: {check} needs 'value'")
        if check == "in_set" and not r.get("values"):
            raise ValueError(f"expectations rule #{i}: in_set needs 'values'")
        if check == "regex" and not r.get("pattern"):
            raise ValueError(f"expectations rule #{i}: regex needs 'pattern'")
        severity = r.get("severity", "fail")
        if severity not in SEVERITIES:
            raise ValueError(
                f"expectations rule #{i}: severity must be one of "
                f"{SEVERITIES}, got {severity!r}"
            )
        # duplicates are judged on CONTENT (two different regexes on
        # one column are two legitimate constraints; severity is NOT
        # content — the same constraint at two severities is
        # ambiguous); the display id stays short, disambiguated with
        # #k on repeats
        content = (
            r.get("column"), check, repr(r.get("value")),
            repr(list(r.get("values", []))), repr(r.get("pattern")),
            repr(r.get("expr")), r.get("name"),
        )
        if content in seen_content:
            raise ValueError(
                f"expectations: duplicate rule {_rule_base_id(r)!r} "
                "(identical column, check, and parameters)"
            )
        seen_content.add(content)
        base = _rule_base_id(r)
        id_counts[base] = id_counts.get(base, 0) + 1
        rid = base if id_counts[base] == 1 else f"{base}#{id_counts[base]}"
        rr = dict(r)
        rr["_id"] = rid
        rr["severity"] = severity
        out.append(rr)
    return out


def _violation_expr(rule: dict) -> Column:
    """Per-row violation predicate (TRUE = violated, FALSE/NULL = ok;
    conditional sums count only TRUE, matching the oracle's CASE)."""
    check = rule["check"]
    if check == "expr":
        # violated only when the expectation evaluates to FALSE; a
        # NULL outcome (e.g. a NULL operand) is not a violation —
        # not_null rules own NULL handling, same as the range checks
        return ~F.coalesce(F.expr(rule["expr"]), F.lit(True))
    c = F.col(rule["column"])
    if check == "not_null":
        return c.isNull()
    if check == "min":
        return c < F.lit(rule["value"])
    if check == "max":
        return c > F.lit(rule["value"])
    if check == "in_set":
        return ~c.isin(list(rule["values"]))
    # regex — cast to string first: the generated oracle wraps the
    # column in CAST(.. AS VARCHAR), and rlike on a non-string column
    # would error under ANSI instead of matching its rendered form
    return ~c.cast("string").rlike(str(rule["pattern"]))


def _violation_sql(rule: dict) -> str:
    check = rule["check"]
    if check == "expr":
        return f"NOT COALESCE(({rule['expr']}), TRUE)"
    col = rule["column"]
    if check == "not_null":
        return f"{col} IS NULL"
    if check == "min":
        return f"{col} < {_sql_lit(rule['value'])}"
    if check == "max":
        return f"{col} > {_sql_lit(rule['value'])}"
    if check == "in_set":
        vals = ", ".join(_sql_lit(v) for v in rule["values"])
        return f"NOT ({col} IN ({vals}))"
    return f"NOT regexp_matches(CAST({col} AS VARCHAR), {_sql_lit(rule['pattern'])})"


def expectations_summary(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Per-rule audit: ``(rule string, severity, n_rows, n_violations
    bigint, violation_rate double)`` — one scan; one 1-row exchange
    carries every per-row counter, each ``unique`` rule adds one
    distinct-key exchange; the per-rule rows explode out of the single
    counter row."""
    rules = validate_rules(rules)
    aggs = [F.count(F.lit(1)).cast("long").alias("__n__")]
    for i, r in enumerate(rules):
        if r["check"] == "unique":
            col = r["column"]
            aggs.append(
                (F.count(F.col(col)) - F.countDistinct(F.col(col)))
                .cast("long")
                .alias(f"__v{i}__")
            )
        else:
            # coalesce: SUM over an EMPTY frame is NULL in both
            # engines; an empty input has zero violations, not unknown
            aggs.append(
                F.coalesce(
                    F.sum(F.when(_violation_expr(r), 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias(f"__v{i}__")
            )
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r["_id"]).alias("rule"),
                F.lit(r["severity"]).alias("severity"),
                F.col(f"__v{i}__").alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    exploded = one.select(F.col("__n__"), F.explode(pairs).alias("p"))
    rate = F.when(
        F.col("__n__") > 0,
        F.col("p.n_violations").cast("double") / F.col("__n__").cast("double"),
    )
    return exploded.select(
        F.col("p.rule").alias("rule"),
        F.col("p.severity").alias("severity"),
        F.col("__n__").alias("n_rows"),
        F.col("p.n_violations").alias("n_violations"),
        rate.alias("violation_rate"),
    )


def expectations_annotate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Per-row quarantine flags: adds one boolean ``ok_<column>_<check>``
    per PER-ROW rule (TRUE = passes; aggregate-shaped rules like
    ``unique`` have no per-row meaning and are rejected) plus the
    conjunctive ``expect_pass``.  ``expect_pass`` conjoins FAIL-severity
    rules only — warn rules annotate without quarantining (the
    Great-Expectations warn contract); a battery of only warn rules
    passes every row.  Pure projection — zero shuffle."""
    rules = validate_rules(rules)
    aggish = [r for r in rules if r["check"] in AGG_CHECKS]
    if aggish:
        raise ValueError(
            "expectations_annotate: aggregate-shaped rules have no per-row "
            f"flag: {[r['_id'] for r in aggish]} (use the summary)"
        )
    named = []
    used = set()
    for r in rules:
        stem = r["name"] if r["check"] == "expr" else r["column"]
        name = f"ok_{stem}_{r['check']}"
        if name in used:  # second rule of the same shape on a column
            name = f"ok_{r['_id'].replace(':', '_').replace('#', '_')}"
        if name in df.columns or name in used:
            raise ValueError(f"expectations_annotate: column {name!r} exists")
        used.add(name)
        named.append((name, r))
    if "expect_pass" in df.columns:
        raise ValueError(
            "expectations_annotate: column 'expect_pass' exists; rename it first"
        )
    # violation TRUE -> not ok; violation NULL (e.g. NULL under a
    # range rule) -> ok (not_null is the rule that owns NULLs); ONE
    # select adds every flag in a single analyzer pass (a withColumn
    # chain re-analyzes the growing plan per rule)
    flags = {n: ~F.coalesce(_violation_expr(r), F.lit(False)) for n, r in named}
    conj = None
    for n, r in named:
        if r["severity"] != "fail":
            continue
        conj = flags[n] if conj is None else conj & flags[n]
    if conj is None:  # warn-only battery: nothing quarantines
        conj = F.lit(True)
    return df.select(
        "*",
        *[flags[n].alias(n) for n in flags],
        conj.alias("expect_pass"),
    )


def expectations_enforce(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Circuit breaker: the frame passes through untouched unless some
    row violates a FAIL-severity per-row rule — then materialization
    FAILS with an error naming the rule and the offending value (the
    strict-cast contract; like casting, the raise lives in the
    projection, so it fires when the column is actually computed).
    Warn-severity rules never stop the job (observe them via the
    summary/annotate modes)."""
    rules = validate_rules(rules)
    aggish = [r for r in rules if r["check"] in AGG_CHECKS]
    if aggish:
        raise ValueError(
            "expectations_enforce: aggregate-shaped rules cannot gate rows: "
            f"{[r['_id'] for r in aggish]} (use the summary)"
        )
    if "expect_checked" in df.columns:
        raise ValueError(
            "expectations_enforce: column 'expect_checked' exists; rename it first"
        )
    expr = None
    for r in rules:
        if r["severity"] != "fail":
            continue
        v = F.coalesce(_violation_expr(r), F.lit(False))
        offender = (
            F.lit(f"[{r['expr']}]")
            if r["check"] == "expr"
            else F.coalesce(F.col(r["column"]).cast("string"), F.lit("NULL"))
        )
        err = F.raise_error(
            F.concat(F.lit(f"expectation violated: {r['_id']} on value "), offender)
        )
        expr = F.when(v, err) if expr is None else expr.when(v, err)
    if expr is None:  # warn-only battery: nothing can raise
        return df.withColumn("expect_checked", F.lit(0))
    # the guard stays a VISIBLE output column (constant 0 on clean
    # data) so column pruning cannot drop it before it runs — the same
    # observability caveat as strict casts: it fires when materialized
    return df.withColumn("expect_checked", expr.otherwise(F.lit(0)))


def expectations_oracle_sql(*, table: str, rules: list[dict]) -> str:
    """DuckDB mirror of :func:`expectations_summary`, generated from
    the same rule list: one aggregate row, unpivoted by UNION ALL."""
    rules = validate_rules(rules)
    counters = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i, r in enumerate(rules):
        if r["check"] == "unique":
            col = r["column"]
            counters.append(
                f"CAST(COUNT({col}) - COUNT(DISTINCT {col}) AS BIGINT) AS v{i}"
            )
        else:
            counters.append(
                f"CAST(COALESCE(SUM(CASE WHEN {_violation_sql(r)} THEN 1 ELSE 0 "
                f"END), 0) AS BIGINT) AS v{i}"
            )
    arms = []
    for i, r in enumerate(rules):
        rid = _sql_lit(r["_id"])
        sev = _sql_lit(r["severity"])
        arms.append(
            f"SELECT {rid} AS rule, {sev} AS severity, n AS n_rows, "
            f"v{i} AS n_violations,\n"
            f"       CASE WHEN n > 0 THEN CAST(v{i} AS DOUBLE) / CAST(n AS DOUBLE) END"
            f" AS violation_rate FROM __ex_c"
        )
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH __ex_c AS MATERIALIZED (
  SELECT {", ".join(counters)}
  FROM {table}
)
{body}
"""
