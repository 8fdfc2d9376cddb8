from .harness_queries import HARNESS_ORACLES, HARNESS_QUERIES, flagship
from .tpch_like import TPCH_ORACLES, TPCH_QUERIES

HARNESS_QUERIES.update(TPCH_QUERIES)
HARNESS_ORACLES.update(TPCH_ORACLES)

__all__ = ["HARNESS_ORACLES", "HARNESS_QUERIES", "flagship"]
