from hybrid_vector_search_spark.functions.predicates import (
    SUPPORTED_OPS,
    compile_filters,
    parse_filters,
    validate_filters_schema,
)
from hybrid_vector_search_spark.functions.vector import (
    cosine_score_col,
    dot_score_pandas_udf,
    l2_normalize_col,
)

__all__ = [
    "SUPPORTED_OPS",
    "compile_filters",
    "parse_filters",
    "validate_filters_schema",
    "cosine_score_col",
    "dot_score_pandas_udf",
    "l2_normalize_col",
]
