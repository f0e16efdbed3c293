"""r16 kernel-equivalence pins.

knn_adjacency moved from a full-row stable argsort (O(n² log n) — ~95%
of the recall-sweep kernel) to np.partition + an exact tie-aware prefix
sort. The result must be BIT-IDENTICAL for every tie pattern: the sweep
query's oracle re-derives the adjacency in SQL with ties broken by
ascending node index, so any divergence is an oracle mismatch.
"""

from __future__ import annotations

import numpy as np

from hybrid_vector_search_spark.operators.hnsw import knn_adjacency


def _reference_adjacency(vectors: np.ndarray, M: int) -> list[list[int]]:
    """The pre-r16 implementation: full stable argsort per row."""
    sim = np.asarray(vectors, dtype=np.float64) @ np.asarray(
        vectors, dtype=np.float64
    ).T
    np.fill_diagonal(sim, -np.inf)
    m = min(int(M), sim.shape[0] - 1)
    idx = np.argsort(-sim, axis=1, kind="stable")[:, :m]
    return [[int(j) for j in row] for row in idx]


def test_knn_adjacency_matches_stable_argsort_random():
    rng = np.random.default_rng(7)
    V = rng.standard_normal((300, 16))
    for M in (1, 4, 8, 64):
        assert knn_adjacency(V, M) == _reference_adjacency(V, M)


def test_knn_adjacency_matches_on_heavy_ties():
    rng = np.random.default_rng(11)
    # integer-rounded vectors force many exact similarity ties,
    # including ties that straddle the top-M boundary
    V = np.round(rng.standard_normal((200, 6)), 0)
    for M in (2, 8, 16):
        assert knn_adjacency(V, M) == _reference_adjacency(V, M)


def test_knn_adjacency_matches_on_duplicate_rows():
    rng = np.random.default_rng(13)
    # duplicated rows: every duplicate group ties at similarity 1·|v|²
    V = np.repeat(rng.standard_normal((30, 8)), 6, axis=0)
    for M in (4, 8, 32):
        assert knn_adjacency(V, M) == _reference_adjacency(V, M)


def test_knn_adjacency_small_and_degenerate():
    rng = np.random.default_rng(17)
    assert knn_adjacency(rng.standard_normal((1, 4)), 8) == [[]]
    V = rng.standard_normal((3, 4))
    assert knn_adjacency(V, 8) == _reference_adjacency(V, 8)
    Z = np.zeros((5, 4))  # all-tie degenerate corpus
    assert knn_adjacency(Z, 3) == _reference_adjacency(Z, 3)


def test_local_df_preserves_exact_bigints_with_nulls(spark):
    """r15 ADVICE #2: pandas inference coerced an int column containing
    None to float64, silently rounding BIGINTs above 2^53 before the
    Arrow cast — local_df now builds integral columns with object
    dtype, so the exact value survives and the plan stays a
    LocalTableScan (the fast path, not the pickled-RDD fallback)."""
    from hybrid_vector_search_spark.plans.registry import local_df

    big = 2**53 + 1  # not representable in float64
    df = local_df(
        spark, [(1, big, 0.5), (2, None, 1.5)], "a LONG, b LONG, c DOUBLE"
    )
    rows = sorted(df.collect(), key=lambda r: r["a"])
    assert rows[0]["b"] == big
    assert rows[1]["b"] is None
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
