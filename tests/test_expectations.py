"""Row-level data-quality expectations (functions/expectations.py):
every check shape hand-verified, the three serving modes, NULL
semantics (range/set/regex rules do NOT own NULLs), the enforce
circuit breaker, rule validation, and the flow op.  Cross-engine
exactness of the summary is covered by the oracle harness
(scripts/check_oracle.py row_expectations)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from openetlagent_spark.functions.expectations import (
    expectations_annotate,
    expectations_enforce,
    expectations_summary,
    validate_rules,
)

RULES = [
    {"column": "k", "check": "not_null"},
    {"column": "v", "check": "min", "value": 0},
    {"column": "v", "check": "max", "value": 100},
    {"column": "status", "check": "in_set", "values": ["a", "b"]},
    {"column": "code", "check": "regex", "pattern": "^[0-9]+$"},
    {"column": "k", "check": "unique"},
]


def _df(spark):
    rows = [
        Row(k=1, v=50, status="a", code="123"),     # clean
        Row(k=None, v=-5, status="c", code="x1"),   # violates not_null/min/in_set/regex
        Row(k=3, v=200, status="b", code="77"),     # violates max
        Row(k=3, v=None, status=None, code=None),   # duplicate k; NULLs own no range/set/regex violation
    ]
    return spark.createDataFrame(rows, "k int, v int, status string, code string")


def test_summary_hand_computed(spark):
    got = {r["rule"]: r for r in expectations_summary(_df(spark), RULES).collect()}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["k:not_null"]["n_violations"] == 1
    assert got["v:min"]["n_violations"] == 1     # -5 only; NULL not a min violation
    assert got["v:max"]["n_violations"] == 1     # 200
    assert got["status:in_set"]["n_violations"] == 1  # 'c'; NULL not counted
    assert got["code:regex"]["n_violations"] == 1     # 'x1'; NULL not counted
    assert got["k:unique"]["n_violations"] == 1       # one surplus duplicate of k=3
    assert got["v:max"]["violation_rate"] == 1 / 4


def test_summary_empty_frame_rate_null(spark):
    df = spark.createDataFrame([], "k int, v int, status string, code string")
    rows = expectations_summary(df, RULES).collect()
    assert all(r["n_rows"] == 0 and r["n_violations"] == 0 for r in rows)
    assert all(r["violation_rate"] is None for r in rows)


def test_annotate_flags_and_conjunction(spark):
    per_row = [r for r in RULES if r["check"] != "unique"]
    out = {r["v"]: r for r in expectations_annotate(_df(spark), per_row).collect()}
    clean = out[50]
    assert clean["expect_pass"] and clean["ok_v_min"] and clean["ok_code_regex"]
    bad_max = out[200]
    assert not bad_max["expect_pass"] and not bad_max["ok_v_max"]
    # NULL under a range rule is OK (not_null owns NULLs)
    null_row = [r for r in expectations_annotate(_df(spark), per_row).collect()
                if r["v"] is None][0]
    assert null_row["ok_v_min"] and null_row["ok_v_max"]
    with pytest.raises(ValueError, match="per-row"):
        expectations_annotate(_df(spark), RULES)  # unique rejected
    with pytest.raises(ValueError, match="exists"):
        expectations_annotate(
            _df(spark).withColumnRenamed("code", "ok_v_min"),
            [{"column": "v", "check": "min", "value": 0}],
        )


def test_enforce_raises_on_violation_passes_clean(spark):
    clean = spark.createDataFrame([Row(k=1, v=5)], "k int, v int")
    rules = [{"column": "v", "check": "max", "value": 10}]
    ok = expectations_enforce(clean, rules).collect()
    assert ok[0]["expect_checked"] == 0
    dirty = spark.createDataFrame([Row(k=1, v=50)], "k int, v int")
    with pytest.raises(Exception, match="expectation violated: v:max"):
        expectations_enforce(dirty, rules).collect()


def test_rule_validation():
    with pytest.raises(ValueError, match="at least one"):
        validate_rules([])
    with pytest.raises(ValueError, match="unknown check"):
        validate_rules([{"column": "a", "check": "positive"}])
    with pytest.raises(ValueError, match="needs 'value'"):
        validate_rules([{"column": "a", "check": "min"}])
    with pytest.raises(ValueError, match="needs 'values'"):
        validate_rules([{"column": "a", "check": "in_set"}])
    with pytest.raises(ValueError, match="needs 'pattern'"):
        validate_rules([{"column": "a", "check": "regex"}])
    with pytest.raises(ValueError, match="duplicate rule"):
        validate_rules([{"column": "a", "check": "not_null"}] * 2)


def test_flow_op_modes(spark):
    from openetlagent_spark.model import SpecError, parse_operation
    from openetlagent_spark.runner import apply_operations

    df = _df(spark)
    per_row = [r for r in RULES if r["check"] != "unique"]
    summary = apply_operations(
        df,
        [parse_operation({"operation_type": "expectations", "rules": RULES})],
        spark, None,
    )
    assert summary.count() == len(RULES)
    filtered = apply_operations(
        df,
        [parse_operation({"operation_type": "expectations", "rules": per_row,
                          "mode": "filter"})],
        spark, None,
    )
    assert filtered.columns == df.columns
    # rows 1 (clean) and the all-NULL k=3 row (NULLs violate no
    # per-row range/set/regex rule) pass; the not_null and max
    # violators are quarantined
    assert sorted(r["v"] for r in filtered.collect() if r["v"] is not None) == [50]
    assert filtered.count() == 2
    with pytest.raises(SpecError, match="mode"):
        parse_operation({"operation_type": "expectations", "rules": per_row,
                         "mode": "audit"})
    with pytest.raises(SpecError, match="unknown check"):
        parse_operation({"operation_type": "expectations",
                         "rules": [{"column": "a", "check": "nope"}]})


def test_summary_single_exchange_plan(spark):
    """One scan, one exchange (the 1-row global aggregate), regardless
    of rule count."""
    import re

    plan = expectations_summary(_df(spark), RULES)._jdf.queryExecution().toString()
    physical = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"Exchange (hash|range|SinglePartition)", physical)) <= 1 or \
        physical.count("Exchange") <= 2  # partial->final global agg


def test_two_parameterized_rules_same_column(spark):
    """Content-based duplicate detection: two DIFFERENT regexes on one
    column are two legitimate constraints with disambiguated ids;
    IDENTICAL rules still raise."""
    rules = [
        {"column": "code", "check": "regex", "pattern": "^[0-9]"},
        {"column": "code", "check": "regex", "pattern": "[0-9]$"},
    ]
    df = spark.createDataFrame(
        [Row(code="1a"), Row(code="a1"), Row(code="11")], "code string"
    )
    got = {r["rule"]: r["n_violations"] for r in
           expectations_summary(df, rules).collect()}
    assert got == {"code:regex": 1, "code:regex#2": 1}
    with pytest.raises(ValueError, match="duplicate rule"):
        validate_rules([rules[0], dict(rules[0])])


def test_annotate_enforce_reserved_column_guards(spark):
    df = spark.createDataFrame([Row(v=1, expect_pass="x")], "v int, expect_pass string")
    with pytest.raises(ValueError, match="expect_pass"):
        expectations_annotate(df, [{"column": "v", "check": "not_null"}])
    df2 = spark.createDataFrame([Row(v=1, expect_checked=0)], "v int, expect_checked int")
    with pytest.raises(ValueError, match="expect_checked"):
        expectations_enforce(df2, [{"column": "v", "check": "not_null"}])


def test_flow_op_mode_rule_compat_at_parse_time(spark):
    from openetlagent_spark.model import SpecError, parse_operation

    with pytest.raises(SpecError, match="per-row rules only"):
        parse_operation({"operation_type": "expectations", "mode": "filter",
                         "rules": [{"column": "k", "check": "unique"}]})


def test_expr_rule_cross_column(spark):
    """expr checks: violated only when the boolean expression is FALSE;
    NULL operands are not violations (not_null owns NULLs)."""
    df = _df(spark)
    rules = [{"check": "expr", "name": "v_le_100_when_k", "expr": "v <= 100 OR k IS NULL"}]
    got = {r["rule"]: r for r in expectations_summary(df, rules).collect()}
    # only (k=3, v=200) violates; (k=None, v=-5) passes via the OR arm,
    # (k=3, v=NULL) evaluates NULL -> not a violation
    assert got["v_le_100_when_k:expr"]["n_violations"] == 1
    ann = expectations_annotate(df, rules)
    assert "ok_v_le_100_when_k_expr" in ann.columns
    assert ann.filter("NOT expect_pass").count() == 1


def test_severity_warn_does_not_gate(spark):
    """warn rules are counted and flagged but never quarantine or
    enforce; the summary carries the severity column."""
    df = _df(spark)
    rules = [
        {"column": "v", "check": "max", "value": 100, "severity": "warn"},
        {"column": "k", "check": "not_null"},
    ]
    summ = {r["rule"]: r for r in expectations_summary(df, rules).collect()}
    assert summ["v:max"]["severity"] == "warn" and summ["v:max"]["n_violations"] == 1
    assert summ["k:not_null"]["severity"] == "fail"
    ann = expectations_annotate(df, rules)
    # the v=200 row fails the warn rule's flag but still expect_passes
    flagged = ann.filter("NOT ok_v_max AND expect_pass").count()
    assert flagged == 1
    # only the not_null (fail) rule quarantines
    assert ann.filter("NOT expect_pass").count() == 1
    # enforce ignores warn rules: drop the violating-k row and the
    # battery materializes even though v=200 trips the warn rule
    clean_k = df.filter("k IS NOT NULL")
    expectations_enforce(clean_k, rules).collect()
    # a warn-only battery can never raise or quarantine
    warn_only = [{"column": "v", "check": "max", "value": 100, "severity": "warn"}]
    assert expectations_annotate(df, warn_only).filter("NOT expect_pass").count() == 0
    expectations_enforce(df, warn_only).collect()


def test_expr_rule_validation():
    with pytest.raises(ValueError, match="needs 'expr'"):
        validate_rules([{"check": "expr", "name": "x"}])
    with pytest.raises(ValueError, match="bare-identifier 'name'"):
        validate_rules([{"check": "expr", "expr": "a < b"}])
    with pytest.raises(ValueError, match="no ';'"):
        validate_rules([{"check": "expr", "name": "x", "expr": "a < b; DROP TABLE t"}])
    with pytest.raises(ValueError, match="severity"):
        validate_rules([{"column": "k", "check": "not_null", "severity": "warning"}])
    # identical expr at two severities is ambiguous -> duplicate
    with pytest.raises(ValueError, match="duplicate"):
        validate_rules([
            {"check": "expr", "name": "x", "expr": "a < b"},
            {"check": "expr", "name": "x", "expr": "a < b", "severity": "warn"},
        ])


def test_expectations_filter_on_a_stream_matches_batch(spark, tmp_path):
    """annotate/filter are pure projections, so the SAME rule battery
    runs unchanged on a structured stream — the quarantine gate a
    live ingest pipeline needs.  Stream output == batch output."""
    from pyspark.sql import functions as F

    rules = [
        {"column": "k", "check": "not_null"},
        {"column": "v", "check": "max", "value": 100},
    ]
    df = _df(spark)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    gated = expectations_annotate(stream, rules).filter(F.col("expect_pass"))
    out = str(tmp_path / "out")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.read.parquet(out).select(*df.columns).collect())
    )
    want = sorted(
        map(tuple,
            expectations_annotate(df, rules).filter(F.col("expect_pass"))
            .select(*df.columns).collect())
    )
    assert got == want and got  # non-trivial: some rows pass, some don't
