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
# ``queries()`` per round.  Cumulative driver-hash coverage reached
# 193/193 in round 8, so round 9's rotation is pure staleness
# refresh: after r08's front cleared everything hashed before r03,
# the oldest remaining rows are the 5 r03-hashed set/window ops, the
# 38 r04-hashed rows, and the r05 block.  This round-9 ordering
# (committed as the FIRST action of the round, per the standing
# rotation discipline):
# (a) all 5 r03-hashed rows (explode_tokens, set_except,
#     set_intersect, topk_per_group, window_moving_avg — displaced
#     from r08's front by that round's second-session additions);
# (b) 23 of the 38 r04-hashed rows — every one except tpch_q1
#     (implementing files UNCHANGED since its last driver hash;
#     staleness: 'current'), dataset_split, exact_distinct, and the
#     twelve repeatedly-green re-checks cube / tpch_q12 / tpch_q18 /
#     unicode_nfc / stats_skew / value_histogram / vocab_oov /
#     text_scrub / stats_moments / quantile_bins / robust_scale /
#     diversity_sample (displaced by the mining + smoothing +
#     community + mixture + embedding-prep + layout-audit waves; all
#     FIFTEEN rotate back in r10);
# (c) the round-9 additions (22): image_decode, sql_join,
#     ann_store_append, pq_codebooks, ann_pq, ohlc_bars,
#     triangle_count, knn_label, dataset_drift, collocations,
#     association_rules, markov_transitions, changepoint, skyline,
#     ewma, rolling_median, label_propagation, temperature_mixture,
#     kcore, skipgram_pairs, negative_sampling, layout_audit — each
#     swapped in (displacing the original 7 r05 backfill slots, then
#     the fifteen re-checks above) only after a local driver-strength
#     exact check, keeping never-driver-checked count at zero; the
#     complete final front-50 re-verified green after the last swap.
# Every carried-over name passed the full exact-mode sweep run in the
# r08 judge session and again in this round's full sweeps; the
# additions passed on landing.  Local `scripts/check_oracle.py` runs
# the full set regardless of order.
_ROUND9_FRONT = [
    # oldest driver hash: r03 (5)
    "explode_tokens", "set_except", "set_intersect", "topk_per_group",
    "window_moving_avg",
    # r03-hashed wave 2 / r04 rows (23 — see (b) above),
    # clearing every CHANGED query whose latest driver row predates r05
    "bigram_lm", "bpe_pairs", "chunk_docs", "cohort_retention",
    "compacted_layout", "cooccurrence_pairs",
    "curation_pipeline", "dataset_mixture",
    "dedup_clusters", "dedup_simhash", "dedup_substring",
    "doc_lm_score", "fuzzy_join",
    "kmeans_clusters", "merge_changes", "outlier_flags",
    "profile_table", "running_totals",
    "scd2_history", "sessionize",
    "stratified_sample", "tfidf_topk",
    "window_distinct_users",
    # round-9 additions (22) — each swapped in after a local
    # driver-strength exact check; see (c) above for the displacement
    # accounting (the mining + smoothing + community waves displaced
    # the cube / tpch_q12 / tpch_q18 / unicode_nfc / stats_skew /
    # value_histogram / vocab_oov / text_scrub / stats_moments /
    # quantile_bins / robust_scale / diversity_sample re-checks —
    # lowest-risk rows whose full exact sweeps stayed green all
    # round; all fifteen displaced rows rotate back in r10)
    "image_decode", "sql_join", "ann_store_append",
    "pq_codebooks", "ann_pq",
    "ohlc_bars", "triangle_count", "knn_label", "dataset_drift",
    "collocations",
    "association_rules", "markov_transitions", "changepoint", "skyline",
    "ewma", "rolling_median", "label_propagation",
    "temperature_mixture", "kcore",
    "skipgram_pairs", "negative_sampling", "layout_audit",
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


_reordered = _reorder(_ROUND9_FRONT, HARNESS_QUERIES)
HARNESS_QUERIES.clear()
HARNESS_QUERIES.update(_reordered)

__all__ = ["HARNESS_ORACLES", "HARNESS_QUERIES", "flagship"]
