"""Product quantization: encode, ADC scan, column pruning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import pq as PQ
from hybrid_vector_search_spark.operators.topk import topk
from hybrid_vector_search_spark.queryvecs import query_vector


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(64):
        v = rng.standard_normal(64)
        rows.append((i, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    return spark.createDataFrame(rows, "id LONG, embedding ARRAY<FLOAT>").cache()


def test_pq_encode_matches_numpy(emb):
    books = PQ.pq_codebooks(64)
    got = {r.id: list(r.codes) for r in PQ.pq_encode(emb, books).collect()}
    for r in emb.collect():
        x = np.asarray(r.embedding, dtype=np.float64).reshape(PQ.PQ_M, -1)
        want = [int((x[m] @ books[m].T).argmax()) for m in range(PQ.PQ_M)]
        assert got[r.id] == want


def test_adc_equals_table_lookup_reconstruction(emb):
    """ADC score must equal q · (concatenation of the assigned centroids)."""
    books = PQ.pq_codebooks(64)
    q = query_vector(5)
    codes = PQ.pq_encode(emb, books)
    scored = {
        r.id: r.score
        for r in codes.select(
            "id", PQ.adc_score_col(books, q).alias("score")
        ).collect()
    }
    qs = q.reshape(PQ.PQ_M, -1)
    for r in codes.collect():
        want = sum(
            float(books[m][r.codes[m]] @ qs[m]) for m in range(PQ.PQ_M)
        )
        assert abs(scored[r.id] - want) < 1e-12


def test_adc_topk_reads_only_codes(emb, tmp_path):
    """The ADC scan over stored codes must not read the float vectors."""
    path = str(tmp_path / "codes")
    books = PQ.pq_codebooks(64)
    PQ.pq_encode(emb, books).write.parquet(path)
    spark = emb.sparkSession
    codes = spark.read.parquet(path)
    plan = (
        topk(
            codes.select(
                "id", PQ.adc_score_col(books, query_vector(5)).alias("score")
            ),
            5,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "embedding" not in plan  # only (id, codes) are scanned
    assert "ArrowEvalPython" not in plan  # pure JVM scoring
