"""hybrid_vector_search_spark — a PySpark-native hybrid (filtered) vector
search and large-scale data-pipeline engine.

Capability parity target: EZ586/Hybrid_Vector_Search (see SURVEY.md) —
hybrid top-K vector similarity with structured-metadata predicates,
competing execution strategies (exact / pre_filter / post_filter / random)
evaluated against a brute-force oracle — re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, Arrow-batched pandas UDFs for
the vectorized scoring hot path, MLlib KMeans for the IVF index, and
partition pruning for list probing.

Beyond parity, the package ships the operators a 100 TB training-data
pipeline needs: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality, tokens, fingerprints), event-stream windowed
aggregation, and multimodal binary-column plumbing.
"""

from hybrid_vector_search_spark.errors import FilterSpecError, ValidationError
from hybrid_vector_search_spark.session import get_spark

__all__ = ["FilterSpecError", "ValidationError", "get_spark"]

__version__ = "0.1.0"
