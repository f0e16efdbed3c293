"""Structured Streaming surface (extension beyond reference parity).

The reference is batch-only (SURVEY.md §2.7) — this package gives every
time-based events operator a streaming twin so the same logical plan runs
over a live stream: windowed aggregation under a watermark
(:mod:`pipeline`) and stateful sessionization via
``applyInPandasWithState`` (:mod:`stateful`).
"""

from hybrid_vector_search_spark.streaming.pipeline import (  # noqa: F401
    dedup_stream,
    read_events_stream,
    run_available_now,
    windowed_agg_stream,
)
from hybrid_vector_search_spark.streaming.stateful import (  # noqa: F401
    sessionize_stream,
)
