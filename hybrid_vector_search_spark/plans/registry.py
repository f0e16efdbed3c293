"""Query registry: every implemented operator exposed as a named query with
a DuckDB oracle.

Each entry is ``(spark, sf_dir) -> DataFrame``; ``ORACLES[name]`` is the
ANSI-SQL equivalent DuckDB runs on the same parquet (views: region nation
customer supplier part orders lineitem events documents embeddings). This
pair IS the correctness gate (driver contract in __spark_entry__.py).

Conventions for bit-stable comparison:
* every computed column aliased identically in Spark and SQL;
* float aggregates rounded (sums to 2, ratios/scores to 6) in BOTH engines;
* vector scores computed in float64 in both engines;
* timestamps rendered as strings (Spark session TZ is UTC).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hybrid_vector_search_spark.functions.portable import (
    grid_avg,
    grid_avg_sql,
    round_portable,
    round_portable_sql,
)
from hybrid_vector_search_spark.functions.predicates import (
    compile_filters,
    filters_to_sql,
)
from hybrid_vector_search_spark.functions.vector import dot_score_pandas_udf
from hybrid_vector_search_spark.operators.topk import grouped_topk, topk
from hybrid_vector_search_spark.queryvecs import query_vector, sql_array_literal
from hybrid_vector_search_spark.sources.loaders import (
    load_table,
    spread,
)
from hybrid_vector_search_spark.sources.loaders import (
    load_corpus as _load_corpus_uncached,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Names registered with side_effects=True (streaming drains, roundtrip
# landings, driver-side escalation loops): exempt from the prepared-plan
# memo, so their bench numbers time a fresh side-effecting pass — the
# bench tags them in BENCH_DETAIL.json so per-query figures are
# self-describing (r15 VERDICT "what's wrong" #2 / next #7).
SIDE_EFFECT_QUERIES: set[str] = set()

# Session-resident hybrid corpus, keyed like every artifact cache.
# Reference parity: its harness loads the vector matrix + metadata into
# RAM once at startup (artifacts/artifacts.py:180-181) and every query
# searches that resident copy — Spark's equivalent is .cache()
# (MEMORY_AND_DISK, partition-distributed: each executor holds its
# slice, spilling to local disk; at 100 TB this is a deliberate
# hot-serving choice, and dropping the .cache() falls back to the
# parquet scan with zero semantic change).
_CORPUS_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def load_corpus(
    spark: SparkSession, sf_dir: str, with_documents: bool = True
) -> DataFrame:
    got = _CORPUS_CACHE.get(sf_dir)
    full = got[1] if got is not None and got[0] is spark else None
    if full is None:
        full = _load_corpus_uncached(spark, sf_dir, True).cache()
        _CORPUS_CACHE[sf_dir] = (spark, full)
    if with_documents:
        return full
    # ONE resident copy of the wide embedding column: the no-documents
    # variant is a projection over the cached full corpus (the join is
    # LEFT on id, so the row set is identical to the bare embeddings)
    return full.select("id", "embedding", "label")


# Prepared-plan memo, keyed (query, sf_dir) with session-identity check
# like every artifact cache. The memo holds the LAZY DataFrame — every
# action on it re-executes the whole physical plan, so results are
# byte-identical; what it skips is re-running the Python builder and
# Catalyst analysis on each call. This is the prepared-statement pattern
# (and reference parity: its harness builds query artifacts once at
# startup — src/harness/run.py — and times per-query execution only).
_PREPARED: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def invalidate_caches() -> None:
    """Drop every session-scoped artifact memo: prepared plans, the
    cached corpus, index layouts (IVF/HNSW), landings, bucketed tables,
    roundtrip fixtures, the parity corpus.

    This is the REFRESH HALF of the staleness contract (README
    "Cache invalidation"): memoized plans capture their input file
    listing at build time, so mutating a table's parquet in place
    mid-session leaves a memoized query undefined (stale rows or a
    FileNotFound/footer error — Spark's scan holds the old listing).
    The supported refresh is a new SparkSession (every cache is keyed
    with a session-identity check, the reference's reload-per-run
    contract — src/harness/run.py:109-112) or this explicit drop within
    one. A fresh ``load_table``/``load_corpus`` call outside the memo
    always re-lists and re-reads."""
    g = globals()
    names = [
        n
        for n, v in g.items()
        if isinstance(v, dict)
        and (
            n.endswith("_CACHE")
            or n in ("_PREPARED", "_BUCKETED_TPCH", "_EVENTS_BY_DAY")
        )
    ]
    for n in names:
        cache = g[n]
        for v in cache.values():
            if isinstance(v, tuple):
                for item in v:
                    if hasattr(item, "unpersist"):
                        try:
                            item.unpersist()
                        except Exception:  # session already stopped
                            pass
        cache.clear()
    # the manifest layer's snapshot-plan memo (r16) is part of the same
    # refresh contract: built plans pin file listings at build time
    from hybrid_vector_search_spark.sources.manifest import (
        invalidate_snapshot_plans,
    )

    invalidate_snapshot_plans()


def register(
    name: str, oracle: str | None = None, side_effects: bool = False
):
    """Register a query. ``side_effects=True`` marks builders that DO
    work per call (streaming drains, roundtrip landings) — they are
    exempt from the prepared-plan memo because calling them again must
    re-run the side effect, not just return the prior sink plan."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if side_effects:
            SIDE_EFFECT_QUERIES.add(name)
            QUERIES[name] = fn
        else:

            def prepared(
                spark: SparkSession, sf_dir: str, _fn=fn, _name=name
            ) -> DataFrame:
                key = (_name, sf_dir)
                got = _PREPARED.get(key)
                if got is not None and got[0] is spark:
                    return got[1]
                df = _fn(spark, sf_dir)
                _PREPARED[key] = (spark, df)
                return df

            prepared.__name__ = fn.__name__
            prepared.__doc__ = fn.__doc__
            prepared.__wrapped__ = fn
            QUERIES[name] = prepared
        if oracle is not None:
            ORACLES[name] = oracle
        return QUERIES[name]

    return deco


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local result rows → DataFrame, via pandas + Arrow.

    Many registered queries do their real work driver-side (backend
    searches, costed dispatches, audit folds) and return a handful of
    literal rows. ``spark.createDataFrame(list_of_tuples, ...)``
    parallelizes those rows as a PICKLED Python RDD, so every downstream
    action launches a Python-worker task just to deserialize them —
    measured ~1.2 s per collect for 20 rows on this host (guide §4: the
    JVM↔Python boundary, paid where no Python is needed at all). Routing
    through a pandas DataFrame with the Arrow conversion path keeps the
    rows JVM-resident after one driver-side Arrow encode: the same
    collect measures ~0.3 s, with identical values and declared types.

    Falls back to the plain verified path when conversion cannot
    represent the rows (exotic nested types, malformed records) — a
    performance fast-path only, never a semantics change."""
    import pandas as pd
    from pyspark.sql import types as T

    try:
        st = (
            schema
            if isinstance(schema, T.StructType)
            else T._parse_datatype_string(schema)
        )
        rows = list(rows)
        # Integral/decimal columns are built with OBJECT dtype: pandas
        # inference coerces an int column containing None to float64
        # (None→NaN), silently rounding BIGINTs above 2^53 before the
        # Arrow cast back — no exception, so the verified fallback
        # below never fired (r15 ADVICE #2). Object columns hand the
        # exact Python ints to Arrow, which casts losslessly or raises
        # (and then the fallback path takes over).
        exact = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.DecimalType)
        data = {
            f.name: pd.Series(
                [r[i] for r in rows],
                dtype=object if isinstance(f.dataType, exact) else None,
            )
            if rows
            else pd.Series([], dtype=object)
            for i, f in enumerate(st.fields)
        }
        pdf = pd.DataFrame(data, columns=[f.name for f in st.fields])
        return spark.createDataFrame(pdf, st)
    except Exception:
        return spark.createDataFrame(rows, schema)


# The wide hybrid corpus as a DuckDB CTE (mirrors sources.loaders.load_corpus)
CORPUS_CTE = (
    "WITH corpus AS (SELECT e.vec_id AS id, e.embedding, e.label, "
    "d.text, d.lang, d.source, d.n_chars "
    "FROM embeddings e LEFT JOIN documents d ON e.vec_id = d.doc_id)"
)


# ---------------------------------------------------------------------------
# Query families (r11 split, verdict task 7): contiguous slices of the
# former single-file registry, imported IN ORDER so registration order,
# query names, and oracle strings stay byte-identical. The hub then
# re-exports every family name (including private helpers and caches) so
# `registry.<name>` keeps working for tests and tools; the cache dicts are
# shared objects, so invalidate_caches() above still reaches all of them.
from hybrid_vector_search_spark.plans import registry_hybrid_ann as _f1  # noqa: E402
from hybrid_vector_search_spark.plans import registry_corpus as _f2  # noqa: E402
from hybrid_vector_search_spark.plans import registry_retrieval as _f3  # noqa: E402
from hybrid_vector_search_spark.plans import registry_relational as _f4  # noqa: E402
from hybrid_vector_search_spark.plans import registry_lakehouse as _f5  # noqa: E402
from hybrid_vector_search_spark.plans import registry_ann_metrics as _f6  # noqa: E402
from hybrid_vector_search_spark.plans import registry_streaming_layouts as _f7  # noqa: E402
from hybrid_vector_search_spark.plans import registry_costed as _f8  # noqa: E402
from hybrid_vector_search_spark.plans import registry_sketches as _f9  # noqa: E402

for _m in (_f1, _f2, _f3, _f4, _f5, _f6, _f7, _f8, _f9):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__") and _k not in globals():
            globals()[_k] = _v
del _m, _k, _v
