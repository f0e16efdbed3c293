"""LocalCorpusServe (serving.py): the driver-local exact/pre_filter
tier. Answer parity with the distributed plans is carried by the
registry oracle gate (hybrid_topk_local_* share the hybrid_topk_*
oracles verbatim); these tests pin the RAM gate, the empty-result
contract, and tiebreak order."""

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.errors import ValidationError
from hybrid_vector_search_spark.plans import registry as R
from hybrid_vector_search_spark.serving import LocalCorpusServe


@pytest.fixture(scope="module")
def serve(spark):
    return LocalCorpusServe.from_corpus(
        R.load_corpus(spark, "/root/testdata/sf0.001")
    )


def test_ram_gate_refuses_before_collect(spark):
    corpus = R.load_corpus(spark, "/root/testdata/sf0.001")
    with pytest.raises(ValidationError, match="GiB budget"):
        LocalCorpusServe.from_corpus(corpus, max_bytes=1024)


def test_empty_corpus_refused_loudly(spark):
    # n=0 passes the RAM gate (need=0); without the explicit guard the
    # build dies inside np.vstack with an opaque numpy error (r13 advice)
    corpus = R.load_corpus(spark, "/root/testdata/sf0.001")
    empty = corpus.filter(F.col("id") < 0)
    with pytest.raises(ValidationError, match="empty"):
        LocalCorpusServe.from_corpus(empty)


def test_exact_matches_distributed_plan(spark, serve):
    from hybrid_vector_search_spark.plans.registry_hybrid_ann import (
        HYBRID_CASES,
    )
    from hybrid_vector_search_spark.queryvecs import query_vector

    case = HYBRID_CASES["hybrid_topk_unfiltered"]
    rows = serve.exact_topk(query_vector(case["seed"]), case["k"])
    want = [
        (r["id"], r["score"])
        for r in R.QUERIES["hybrid_topk_unfiltered"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    got = [(i, round(s, 6)) for i, s in rows]
    assert got == want


def test_prefilter_selectivity_and_empty(spark, serve):
    from hybrid_vector_search_spark.queryvecs import query_vector

    q = query_vector(3)
    # impossible conjunct → empty, not an error (the engine's
    # empty-result contract)
    assert serve.prefilter_topk(q, {"label": {"eq": -999}}, 5) == []
    # a real filter returns only passing ids
    rows = serve.prefilter_topk(q, {"label": {"in": [1, 2]}}, 100)
    corpus = R.load_corpus(spark, "/root/testdata/sf0.001")
    allowed = {
        r["id"]
        for r in corpus.filter(F.col("label").isin(1, 2))
        .select("id")
        .collect()
    }
    assert rows and {i for i, _ in rows} <= allowed


def test_tiebreak_score_desc_id_asc(serve):
    import numpy as np

    ids = np.array([7, 3, 9, 1], dtype=np.int64)
    scores = np.array([0.5, 0.5, 0.9, 0.5])
    out = serve._topk(ids, scores, 4)
    assert out == [(9, 0.9), (1, 0.5), (3, 0.5), (7, 0.5)]
