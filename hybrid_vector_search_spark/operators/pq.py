"""Product Quantization (PQ): subspace codebooks, code assignment, and an
asymmetric-distance (ADC) top-K scan.

PQ is the storage-side workhorse of large-scale vector search (FAISS
``IndexPQ`` / ``IVFPQ``): split each D-dim vector into ``m`` subvectors,
quantize each against a small per-subspace codebook (``ks`` centroids), and
store only the ``m`` uint8 codes — a 64-d float32 vector becomes 4 bytes
(64×). At query time, Asymmetric Distance Computation (ADC) pre-computes
the query's dot product against every centroid once (an ``m × ks`` lookup
table on the driver) and scores each row as the SUM of ``m`` table lookups
— no float vector is ever read. The reference stops at IVF/HNSW
(src/dataio/loaders.py:106-163); PQ is the natural Spark-native extension
for the 100 TB tier where the embedding column dominates storage.

Spark mapping:

* **encode** — one Arrow-batched pandas UDF: reshape the batch to
  ``(n, m, sub)``, one GEMM per subspace against the codebook, argmax.
* **ADC scan** — pure JVM whole-stage codegen: per-subspace lookup-table
  literals indexed by the stored code (``element_at``), summed. The scan
  reads ONLY the 4-int code column: column pruning drops the float
  embeddings entirely, which is the whole point at scale.
* Codebooks are seed-derived unit vectors (the same generator as the
  query vectors), so code assignment is a pure function of (embedding,
  literals) — the DuckDB oracle replays it in SQL and both the codes and
  the ADC top-K get full value-hash correctness rows. With inner-product
  scoring and unit-norm centroids, nearest-centroid-by-L2 ⇔
  max-dot-product, so the argmax assignment IS the PQ quantizer.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hybrid_vector_search_spark.functions.vector import double_array_lit
from hybrid_vector_search_spark.queryvecs import query_vector, sql_array_literal

PQ_M = 4          # subspaces
PQ_KS = 16        # centroids per subspace (4-bit codes)
PQ_SEED0 = 300    # codebook seed base — shared with the SQL oracle


def pq_codebooks(
    dim: int, m: int = PQ_M, ks: int = PQ_KS, seed0: int = PQ_SEED0
) -> np.ndarray:
    """``(m, ks, dim/m)`` unit-norm seeded codebooks. Seed-derived (not
    trained) so assignment is deterministic and engine-portable; a
    production build would k-means each subspace the same way IVFIndex
    trains its coarse lists — the plan shape downstream is identical."""
    sub = dim // m
    return np.stack(
        [
            np.stack(
                [query_vector(seed0 + mi * ks + j, sub) for j in range(ks)]
            )
            for mi in range(m)
        ]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[m]) — one Arrow pass, one GEMM per subspace.
    Ties break toward the lowest code in both engines (np.argmax /
    list_position take the first maximum)."""
    m, ks, sub = codebooks.shape
    books = codebooks.astype(np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            if len(batch) == 0:
                yield pd.Series([], dtype=object)
                continue
            x = np.vstack(batch.to_numpy()).astype(np.float64)
            x = x.reshape(len(x), m, sub)
            codes = np.empty((len(x), m), dtype=np.int32)
            for mi in range(m):
                codes[:, mi] = (x[:, mi, :] @ books[mi].T).argmax(axis=1)
            yield pd.Series(list(codes.tolist()))

    return corpus.select(F.col(id_col), _enc(F.col(emb_col)).alias("codes"))


def adc_score_col(
    codebooks: np.ndarray, qvec: np.ndarray, codes_col: str = "codes"
) -> Column:
    """ADC score as a PURE JVM expression: the query⋅centroid lookup
    tables are computed once on the driver and embedded as array
    literals; each row's score is ``m`` ``element_at`` lookups summed —
    whole-stage codegen over the 4-int code column, no Python, no float
    vectors read."""
    m, ks, sub = codebooks.shape
    q = np.asarray(qvec, dtype=np.float64).reshape(m, sub)
    luts = [codebooks[mi].astype(np.float64) @ q[mi] for mi in range(m)]
    terms = [
        F.element_at(
            # one SQL parse per LUT instead of ks lit() round trips
            # (m×ks literals per plan build otherwise — guide §1.2)
            double_array_lit(luts[mi]),
            F.col(codes_col)[mi] + 1,
        )
        for mi in range(m)
    ]
    score = terms[0]
    for t in terms[1:]:  # fixed left-assoc order — mirrored in the SQL twin
        score = score + t
    return score


def pq_code_exprs(emb: str = "embedding", dim: int = 64) -> list[str]:
    """DuckDB twin of :func:`pq_encode` — one argmax-by-dot expression per
    subspace over the same seeded codebook literals (1-based list
    slices)."""
    books = pq_codebooks(dim)
    m, ks, sub = books.shape
    parts = []
    for mi in range(m):
        lo, hi = mi * sub + 1, (mi + 1) * sub
        dots = ", ".join(
            f"list_dot_product(({emb}::DOUBLE[])[{lo}:{hi}], "
            f"{sql_array_literal(books[mi][j])})"
            for j in range(ks)
        )
        parts.append(
            f"(list_position([{dots}], list_max([{dots}])) - 1)::INT"
        )
    return parts


def pq_codes_sql(emb: str = "embedding", dim: int = 64) -> str:
    """The per-subspace code expressions packed as one SQL list."""
    return "[" + ", ".join(pq_code_exprs(emb, dim)) + "]"


def adc_score_sql(qvec: np.ndarray, codes: str = "codes", dim: int = 64) -> str:
    """DuckDB twin of :func:`adc_score_col` — identical lookup tables,
    identical left-associated addition order."""
    books = pq_codebooks(dim)
    m, ks, sub = books.shape
    q = np.asarray(qvec, dtype=np.float64).reshape(m, sub)
    terms = [
        f"list_extract({sql_array_literal(books[mi].astype(np.float64) @ q[mi])}, "
        f"{codes}[{mi + 1}] + 1)"
        for mi in range(m)
    ]
    return "(" + " + ".join(terms) + ")"
