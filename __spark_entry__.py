"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``hybrid_vector_search_spark``; this module is a
thin adapter over its query registry (plans/registry.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from hybrid_vector_search_spark.plans.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hybrid filtered top-K
    vector search (filter → float64 IP scoring → TakeOrderedAndProject)."""
    return QUERIES["hybrid_topk_exact"](spark, "/root/testdata/sf0.001")


def _last_verified_round() -> dict[str, int]:
    """Per query, the LATEST round with a green driver row in
    CORRECTNESS_r*.json (repo root); absent = never verified (0). Used
    only to ORDER the registry — the driver samples a prefix of
    ``queries()``, so fronting never-verified first and then
    least-recently-verified keeps every query's cross-round verification
    age bounded instead of letting early-registered entries monopolize
    the sample."""
    import json
    import re

    last: dict[str, int] = {}
    for path in sorted(Path(_REPO_ROOT).glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name, res in rows.items():
                if isinstance(res, dict) and res.get("rows_match") and res.get(
                    "schema_match"
                ):
                    last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered_names() -> list[str]:
    """Registry names ordered by verification age: never-driver-verified
    first, then least-recently-verified (stable within a round group)."""
    last = _last_verified_round()
    names = list(QUERIES)
    return sorted(names, key=lambda n: (last.get(n, 0), names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
