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
# ``queries()`` (CORRECTNESS_r01/r02 each hold exactly the first 50 names
# in registration order).  Rounds 1-2 verified the core-operator half of
# the surface; this ordering front-loads the queries that do not yet have
# a driver CORRECTNESS row (TPC-H suite, asof/range joins, rollup/
# grouping-sets, window frames, curation ops, ...) plus a few sentinel
# re-checks, so that cumulative driver coverage across rounds reaches
# every registered query.  Local `scripts/check_oracle.py` runs the full
# set regardless of order.
_ROUND3_FRONT = [
    # unchecked in CORRECTNESS_r02 (46)
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "asof_join", "range_join", "session_window",
    "rollup", "grouping_sets", "percentile", "stats_moments",
    "approx_distinct", "window_moving_avg", "window_range_frame",
    "window_distribution", "topk_per_group", "funnel",
    "bind_multikey", "bind_salted", "set_intersect", "set_except",
    "explode_tokens", "dataset_split", "dataset_mixture",
    "contamination", "pack_sequences", "dedup_clusters", "text_scrub",
    # new this round — first driver check (4)
    "merge_changes", "scd2_history", "stratified_sample", "chunk_docs",
]


def _reorder(front: list[str], mapping: dict) -> dict:
    head = {k: mapping[k] for k in front if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


_reordered = _reorder(_ROUND3_FRONT, HARNESS_QUERIES)
HARNESS_QUERIES.clear()
HARNESS_QUERIES.update(_reordered)

__all__ = ["HARNESS_ORACLES", "HARNESS_QUERIES", "flagship"]
