from hybrid_vector_search_spark.plans.registry import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
