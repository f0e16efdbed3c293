from hybrid_vector_search_spark.sources.loaders import (
    TESTDATA_TABLES,
    load_corpus,
    load_table,
    validate_corpus,
    validate_K,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_corpus",
    "load_table",
    "validate_corpus",
    "validate_K",
]
