"""The committed corpus-curation example (examples/curation_config.yaml
+ examples/pipelines/corpus_curation.yaml) runs end-to-end through
run_flow and lands the declared schema — the curation analogue of
test_reference_pipelines."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from openetlagent_spark.model import load_pipeline_config, load_pipeline_flow
from openetlagent_spark.runner import run_flow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_curation_pipeline(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/corpus_curation.yaml"))
    # redirect the sink into the test sandbox
    config.outputs["curated"].path = str(tmp_path / "curated")
    result, ok, feedback = run_flow(spark, config, flow, "curated", single_file=True)
    assert ok, feedback
    n_source = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert 0 < result.count() < n_source  # both filters bit
    # the SINK carries exactly the declared schema (save-time projection)
    landed = spark.read.parquet(str(tmp_path / "curated"))
    assert set(landed.columns) == {
        "doc_id", "text", "lang", "source", "dup_2gram_frac", "split"
    }
    rows = landed.collect()
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"} and "train" in splits
    assert all(r.dup_2gram_frac <= 0.2 for r in rows)


def test_example_keyword_search_pipeline(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/keyword_search.yaml"))
    config.outputs["search_hits"].path = str(tmp_path / "hits")
    result, ok, feedback = run_flow(spark, config, flow, "search_hits", single_file=True)
    assert ok, feedback
    rows = result.orderBy("score", ascending=False).collect()
    assert len(rows) == 20
    # ranking is deterministic and descending
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_example_fuzzy_linkage_pipeline(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/fuzzy_linkage.yaml"))
    config.outputs["fuzzy_pairs_out"].path = str(tmp_path / "pairs")
    result, ok, feedback = run_flow(spark, config, flow, "fuzzy_pairs_out", single_file=True)
    assert ok, feedback
    rows = result.collect()
    assert rows, "sf0.001 corpus should contain at least one close prefix pair"
    assert all(r.id_a < r.id_b and 0 <= r.dist <= 8 for r in rows)


def test_example_pretraining_order_pipeline(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/pretraining_order.yaml")
    )
    config.outputs["pretrain_ready"].path = str(tmp_path / "pretrain")
    result, ok, feedback = run_flow(spark, config, flow, "pretrain_ready", single_file=True)
    assert ok, feedback
    landed = spark.read.parquet(str(tmp_path / "pretrain"))
    rows = landed.collect()
    n_source = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert 0 < len(rows) < n_source          # the gate bit
    # positions are an exact 1..n permutation in shuffle-key order
    assert sorted(r.position for r in rows) == list(range(1, len(rows) + 1))
    by_pos = sorted(rows, key=lambda r: r.position)
    keys = [(r.shuffle_key, r.doc_id) for r in by_pos]
    assert keys == sorted(keys)
    # every survivor is at/above its source's median-length threshold
    assert all(r.n_chars >= r.len_threshold for r in rows)


def test_example_decontamination_pipeline(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/decontamination.yaml")
    )
    config.outputs["decontaminated"].path = str(tmp_path / "decon")
    result, ok, feedback = run_flow(spark, config, flow, "decontaminated", single_file=True)
    assert ok, feedback
    landed = spark.read.parquet(str(tmp_path / "decon"))
    n_source = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    n = landed.count()
    # keep_best dedup collapses the corpus's near-dup clusters; the
    # disjoint benchmark drops nothing from this synthetic corpus
    assert 0 < n < n_source
    assert set(landed.columns) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_example_quality_gate_pipeline(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/quality_gate.yaml"))
    config.outputs["quality_gated"].path = str(tmp_path / "gated")
    result, ok, feedback = run_flow(spark, config, flow, "quality_gated", single_file=True)
    assert ok, feedback
    landed = spark.read.parquet(str(tmp_path / "gated"))
    assert set(landed.columns) == {"doc_id", "lang", "lm_score", "bucket"}
    rows = landed.collect()
    n_source = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert 0 < len(rows) < n_source  # the rule gate bit
    assert {r.bucket for r in rows} <= {"head", "middle", "tail"}
    # per-language bucketing: any language with >= 3 docs has all buckets
    by_lang: dict[str, set] = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.bucket)
    big = [l for l in by_lang if sum(1 for r in rows if r.lang == l) >= 9]
    assert all(by_lang[l] == {"head", "middle", "tail"} for l in big)


def test_example_telemetry_and_sketch_pipelines(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))

    flow = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/telemetry_rollup.yaml"))
    config.outputs["telemetry_hourly"].path = str(tmp_path / "hourly")
    result, ok, feedback = run_flow(spark, config, flow, "telemetry_hourly", single_file=True)
    assert ok, feedback
    rows = result.collect()
    assert rows and any(r.observed == 0 for r in rows) or all(r.observed == 1 for r in rows)
    # the grid is dense: per type, hours form a contiguous range
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.hour_idx)
    for hours in by_type.values():
        hours.sort()
        assert hours == list(range(hours[0], hours[-1] + 1))

    flow2 = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/distinct_users.yaml"))
    config.outputs["distinct_users"].path = str(tmp_path / "du")
    result2, ok2, feedback2 = run_flow(spark, config, flow2, "distinct_users", single_file=True)
    assert ok2, feedback2
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    truth = {
        r.event_type: r.c
        for r in ev.where("user_id IS NOT NULL").groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("c")).collect()
    }
    for r in result2.collect():
        assert abs(r.hll_est - truth[r.event_type]) / truth[r.event_type] < 0.25


def test_example_distilled_gate_pipeline(spark, tmp_path):
    """The distillation example (gopher_rules weak labels →
    classifier_train filter) runs end-to-end and keeps a non-trivial
    subset — the flow-surface twin of the distill_gate harness query,
    exercising the boolean-label mapping."""
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/distilled_gate.yaml"))
    config.outputs["distilled_docs"].path = str(tmp_path / "distilled")
    result, ok, feedback = run_flow(spark, config, flow, "distilled_docs", single_file=True)
    assert ok, feedback
    n_source = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    kept = result.count()
    assert 0 < kept < n_source  # the learned gate actually separates
    landed = spark.read.parquet(str(tmp_path / "distilled"))
    assert set(landed.columns) == {"doc_id", "lang", "n_chars"}


def test_example_hot_hours_and_threshold_tuning(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))

    flow = load_pipeline_flow(os.path.join(ROOT, "examples/pipelines/hot_hours.yaml"))
    config.outputs["hot_hours"].path = str(tmp_path / "hot")
    result, ok, feedback = run_flow(spark, config, flow, "hot_hours", single_file=True)
    assert ok, feedback
    rows = result.collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)  # hottest first
    # spot-check the top bucket against a direct count
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    top = rows[0]
    direct = (
        ev.where("ts IS NOT NULL AND event_type IS NOT NULL")
        .where(F.col("event_type") == top.event_type)
        .where(F.floor(F.col("ts").cast("timestamp").cast("double") / 3600.0)
               .cast("long") == top.bucket_idx)
        .count()
    )
    assert top.n_rows == direct

    flow2 = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/threshold_tuning.yaml")
    )
    config.outputs["threshold_tuning"].path = str(tmp_path / "tt")
    result2, ok2, feedback2 = run_flow(
        spark, config, flow2, "threshold_tuning", single_file=True
    )
    assert ok2, feedback2
    sweep = {r.thr: r for r in result2.collect()}
    assert len(sweep) == 5
    for r in sweep.values():
        assert r.tp + r.fp + r.fn + r.tn == r.n
    # recall is monotonically non-increasing as the threshold rises
    recalls = [sweep[t].recall for t in sorted(sweep)]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]) if a is not None and b is not None)


def test_example_data_quality_audit(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/data_quality_audit.yaml")
    )
    config.outputs["quality_audit"].path = str(tmp_path / "qa")
    result, ok, feedback = run_flow(spark, config, flow, "quality_audit",
                                    single_file=True)
    assert ok, feedback
    rows = {r.rule: r for r in result.collect()}
    assert set(rows) == {"o_custkey:not_null", "o_totalprice:min",
                         "o_orderstatus:in_set", "o_orderpriority:regex",
                         "o_orderkey:unique", "low_price_only_finished:expr"}
    assert rows["low_price_only_finished:expr"].severity == "warn"
    assert all(
        r.severity == "fail" for k, r in rows.items()
        if k != "low_price_only_finished:expr"
    )
    # the synthetic orders are clean on the fail rules — every fail
    # audit row reports zero (the warn expr rule is data-dependent)
    for k, r in rows.items():
        assert r.n_rows == 1500
        if r.severity == "fail":
            assert r.n_violations == 0


def test_example_rate_shift_and_next_event(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))

    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/rate_shift_audit.yaml")
    )
    config.outputs["rate_shift_audit"].path = str(tmp_path / "shift")
    result, ok, feedback = run_flow(
        spark, config, flow, "rate_shift_audit", single_file=True
    )
    assert ok, feedback
    rows = result.collect()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert len(rows) == ev.select("event_type").distinct().count()
    strengths = [r.strength for r in rows]
    assert strengths == sorted(strengths, reverse=True)
    assert all(r.strength == abs(r.cusum_scaled) for r in rows)

    flow2 = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/next_event_model.yaml")
    )
    config.outputs["next_event_model"].path = str(tmp_path / "markov")
    result2, ok2, feedback2 = run_flow(
        spark, config, flow2, "next_event_model", single_file=True
    )
    assert ok2, feedback2
    trans = result2.collect()
    assert trans
    # per-source probabilities are a distribution
    from collections import defaultdict
    per_src = defaultdict(float)
    for r in trans:
        per_src[r.src] += r.prob
    assert all(abs(v - 1.0) < 1e-9 for v in per_src.values())


def test_example_refresh_audit_pipeline(spark, tmp_path):
    """The refresh_audit example (snapshot_diff through the CLI config)
    lands the exact status counts the simulated batch implies."""
    config = load_pipeline_config(os.path.join(ROOT, "examples/config.yaml"))
    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/refresh_audit.yaml")
    )
    config.outputs["refresh_audit"].path = str(tmp_path / "refresh_audit")
    result, ok, feedback = run_flow(
        spark, config, flow, "refresh_audit", single_file=True
    )
    assert ok, feedback
    got = {r.diff_status: r.n for r in result.collect()}
    # the example drops order 103 and bumps order 105's quantity
    assert got == {"removed": 1, "changed": 1, "unchanged": 8}


def test_example_privacy_release_screen(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/privacy_release_screen.yaml")
    )
    config.outputs["privacy_cells"].path = str(tmp_path / "cells")
    result, ok, feedback = run_flow(spark, config, flow, "privacy_cells", single_file=True)
    assert ok, feedback
    rows = result.collect()
    assert rows and all(r.group_size < 10 for r in rows)
    # sorted ascending by size per the flow's sort op
    sizes = [r.group_size for r in rows]
    assert sizes == sorted(sizes)


def test_example_benford_fraud_screen(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/benford_fraud_screen.yaml")
    )
    config.outputs["benford_digits"].path = str(tmp_path / "digits")
    result, ok, feedback = run_flow(spark, config, flow, "benford_digits", single_file=True)
    assert ok, feedback
    rows = result.collect()
    assert [r.digit for r in rows] == sorted(r.digit for r in rows)
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-9
    assert all(r.chi2_term >= 0.0 for r in rows)


def test_example_experiment_readout(spark, tmp_path):
    config = load_pipeline_config(os.path.join(ROOT, "examples/curation_config.yaml"))
    flow = load_pipeline_flow(
        os.path.join(ROOT, "examples/pipelines/experiment_readout.yaml")
    )
    config.outputs["ab_readout"].path = str(tmp_path / "ab")
    result, ok, feedback = run_flow(spark, config, flow, "ab_readout", single_file=True)
    assert ok, feedback
    [row] = result.collect()
    assert row.n_a > 0 and row.n_b > 0
    assert row.var_a > 0.0 and row.var_b > 0.0
