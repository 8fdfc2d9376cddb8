from .harness_queries import HARNESS_ORACLES, HARNESS_QUERIES, flagship

__all__ = ["HARNESS_ORACLES", "HARNESS_QUERIES", "flagship"]
