from .analytics import ANALYTICS_ORACLES, ANALYTICS_QUERIES
from .harness_queries import HARNESS_ORACLES, HARNESS_QUERIES, flagship
from .tpch_like import TPCH_ORACLES, TPCH_QUERIES
from .tpch_more import TPCH_MORE_ORACLES, TPCH_MORE_QUERIES

HARNESS_QUERIES.update(TPCH_QUERIES)
HARNESS_ORACLES.update(TPCH_ORACLES)
HARNESS_QUERIES.update(ANALYTICS_QUERIES)
HARNESS_ORACLES.update(ANALYTICS_ORACLES)
HARNESS_QUERIES.update(TPCH_MORE_QUERIES)
HARNESS_ORACLES.update(TPCH_MORE_ORACLES)

# The driver's correctness harness checks the FIRST 50 entries of
# ``queries()`` per round.  Round-7 failure mode: no _ROUND7_FRONT was
# committed, so the driver re-verified r06's identical front-50 and
# nine queries sat without rows.  This round-8 ordering (committed as
# the FIRST action of the round, per VERDICT r07 item 1):
# (a) the 13 never-driver-checked queries: the 5 r07 additions
#     (quantile_sketch, qsketch_store, hll_store, cms_store,
#     classifier_file) — each locally exact-verified at driver
#     strength when it landed and again in the r07 judge session —
#     plus this round's qsketch_prefilter, classifier_train,
#     classifier_warm, weighted_sample, kmv_distinct,
#     kmv_set_overlap, kmv_store and distill_gate (exact-verified
#     on landing);
# (b) the 4 queries whose latest driver hash is still r02 (equality,
#     assignation, concatenation, comparison) — displaced in the r06
#     rotation, skipped by the missing r07 rotation, re-verified
#     locally (exact mode) in the r07 judge session: ALL PASS;
# (c) backfill to exactly 50 with the oldest-stale rows from
#     scripts/staleness.py: the 23 r03-stale (TPC-H q2-q7/q10/q14/
#     q19/q22, grouping sets, percentile, window/topk, set ops,
#     explode, multikey bind, session_window, asof/range joins,
#     rollup, approx_distinct [rows-only by nature]) and 4 r04-stale
#     core rows (application, casting, flagship, lang_id;
#     13+6+4+23+4 = 50 — dedup_substring, dedup_simhash, bpe_pairs,
#     outlier_flags, unicode_nfc, value_histogram, profile_table and
#     curation_pipeline were displaced by this round's first eight
#     additions, and vocab_oov, fuzzy_join, tfidf_topk, bigram_lm,
#     doc_lm_score, running_totals by the six later-session additions
#     below — every displacement only after the incoming query passed
#     a local driver-strength exact check on landing).
# (a') the 11 additions of the round's second session, never
#     driver-checked, each exact-verified on landing AND re-verified
#     after the session's plan-hardening pass: rollup_store,
#     rollup_day, spike_buckets, heavy_hitters, classifier_eval,
#     embedding_gram, time_weighted_avg, bucketed_join,
#     row_expectations, sql_transform, ann_store (the last five
#     displace the set_intersect / set_except / explode_tokens /
#     topk_per_group / window_moving_avg r03 re-checks — all five pass
#     every local full sweep, including this session's full runs).
# Local `scripts/check_oracle.py` runs the full set regardless of
# order.
_ROUND8_FRONT = [
    # never driver-checked (r07 tail + r08 additions)
    "quantile_sketch", "qsketch_store", "hll_store", "cms_store",
    "classifier_file", "qsketch_prefilter", "classifier_train",
    "classifier_warm", "weighted_sample", "kmv_distinct",
    "kmv_set_overlap", "kmv_store", "distill_gate",
    # never driver-checked (r08 second-session additions, 11)
    "rollup_store", "rollup_day", "spike_buckets", "heavy_hitters",
    "classifier_eval", "embedding_gram", "time_weighted_avg",
    "bucketed_join", "row_expectations", "sql_transform",
    "ann_store",
    # last hashed r02 (4)
    "equality", "assignation", "concatenation", "comparison",
    # oldest stale: r03 (18)
    "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q10", "tpch_q14", "tpch_q19", "tpch_q22",
    "grouping_sets", "percentile",
    "approx_distinct",
    "bind_multikey", "session_window", "asof_join", "range_join",
    "rollup",
    # next oldest: r04 (4)
    "application", "casting", "flagship", "lang_id",
]


def _reorder(front: list[str], mapping: dict) -> dict:
    # A typo here must fail LOUDLY: silently dropping an unknown name
    # would shrink the driver's front-50 gate — the silent-rotation
    # failure class the round-7 postmortem above describes.
    unknown = [k for k in front if k not in mapping]
    if unknown:
        raise KeyError(f"front-50 rotation names not in HARNESS_QUERIES: {unknown}")
    if len(front) != 50 or len(set(front)) != 50:
        raise ValueError(
            f"front-50 rotation must hold exactly 50 distinct names, got "
            f"{len(front)} ({len(set(front))} distinct)"
        )
    head = {k: mapping[k] for k in front}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


_reordered = _reorder(_ROUND8_FRONT, HARNESS_QUERIES)
HARNESS_QUERIES.clear()
HARNESS_QUERIES.update(_reordered)

__all__ = ["HARNESS_ORACLES", "HARNESS_QUERIES", "flagship"]
