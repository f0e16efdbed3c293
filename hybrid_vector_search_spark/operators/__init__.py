from hybrid_vector_search_spark.operators.topk import grouped_topk, topk

__all__ = ["grouped_topk", "topk"]
