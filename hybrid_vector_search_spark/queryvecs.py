"""Deterministic query vectors shared by Spark queries and DuckDB oracles.

The driver's correctness gate runs our Spark plan and our ANSI-SQL oracle
side by side; both must score against bit-identical query vectors, so the
vectors are generated from fixed seeds here (no model inference — testdata
embeddings are pre-computed 64-d unit vectors, TESTDATA.md).
"""

from __future__ import annotations

import numpy as np

DIM = 64


def query_vector(seed: int, dim: int = DIM) -> np.ndarray:
    """Unit-L2 float64 query vector, deterministic in the seed."""
    rng = np.random.RandomState(seed)
    v = rng.randn(dim)
    return v / np.linalg.norm(v)


def sql_array_literal(vec: np.ndarray) -> str:
    """Render a vector as a DuckDB DOUBLE[] literal with full precision."""
    body = ", ".join(f"{x:.17g}" for x in vec)
    return f"[{body}]::DOUBLE[]"
