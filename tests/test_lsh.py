"""Sign-random-projection LSH: bucket determinism, multi-probe sets,
full-probe equivalence to exact search, partial-probe recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import lsh as LSH
from hybrid_vector_search_spark.operators.strategies import ExactBackend
from hybrid_vector_search_spark.queryvecs import query_vector
from hybrid_vector_search_spark.sources.loaders import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .withColumnRenamed("vec_id", "id")
        .cache()
    )


def test_bucket_udf_matches_driver_side(spark, emb):
    """Executor bucket assignment ≡ driver-side bucket_of per row."""
    planes = LSH.hyperplanes(4, dim=64)
    rows = (
        emb.withColumn("bucket", LSH.bucket_udf(planes)(F.col("embedding")))
        .select("id", "embedding", "bucket")
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r.bucket == LSH.bucket_of(r.embedding, planes)


def test_probe_set_hamming():
    planes = LSH.hyperplanes(4, dim=64)
    q = query_vector(31)
    base = LSH.bucket_of(q, planes)
    probes0 = LSH.probe_set(q, planes, probe_hamming=0)
    probes1 = LSH.probe_set(q, planes, probe_hamming=1)
    assert probes0 == [base]
    assert len(probes1) == 5  # base + 4 single-bit flips
    assert set(probes1) >= {base}
    for p in probes1:
        assert bin(p ^ base).count("1") <= 1


def test_full_probe_equals_exact(spark, emb):
    """Probing every bucket (Hamming ≤ nbits) degenerates to exact."""
    q = query_vector(31)
    n = emb.count()
    plan, probes = LSH.lsh_topk_plan(emb, q, k=10, nbits=4, probe_hamming=4)
    assert len(probes) == 16
    ann_ids = [r.id for r in plan.collect()]
    exact_ids, _ = ExactBackend(emb, n).search(q, {}, 10)
    assert ann_ids == exact_ids


def test_partial_probe_recall_reasonable(spark, emb):
    """Hamming ≤ 1 multi-probe should recover most of the true top-10 on
    the sf0.001 corpus (sanity floor, not a tuned guarantee)."""
    q = query_vector(31)
    n = emb.count()
    plan, _ = LSH.lsh_topk_plan(emb, q, k=10, nbits=4, probe_hamming=1)
    ann = {r.id for r in plan.collect()}
    exact_ids, _ = ExactBackend(emb, n).search(q, {}, 10)
    recall = len(ann & set(exact_ids)) / 10
    assert recall >= 0.5


def test_post_filter_lsh_backend(spark, emb):
    """Strategy contract: k results on a broad filter, stats fields
    filled, ladder escalates on a strict filter without crashing."""
    from hybrid_vector_search_spark.operators.lsh import LSHPostFilterBackend
    from hybrid_vector_search_spark.operators.strategies import get_backend

    n = emb.count()
    be = get_backend("post_filter_lsh", emb, n)
    assert isinstance(be, LSHPostFilterBackend)
    q = query_vector(31)

    ids, stats = be.search(q, {}, 5)
    assert len(ids) == 5
    assert stats["method"] == "post_filter_lsh"
    assert stats["lists_probed"] >= 1
    assert stats["scored_vectors"] >= len(ids)
    assert stats["kth_at_stop"] is not None
    # ids ordered score DESC (ties id ASC)
    assert stats["scores"] == sorted(stats["scores"], reverse=True)

    # strict filter: survivors may be < k, ladder must exhaust gracefully
    ids2, stats2 = be.search(q, {"label": {"eq": 0}}, 10)
    assert len(ids2) <= 10
    assert "radius_stop=" in stats2["notes"]


def test_lsh_costed_ladder_ab(spark, emb):
    """Costed vs fixed radius-ladder A/B (r6 VERDICT #7): strict filter →
    the P(r)-coverage entry jumps to the final radius (rungs_run 1 vs 3)
    and, because the fixed ladder exhausts to the same radius, the probe
    sets — hence the answers — are identical; broad filter → entry 0,
    the fixed path byte-for-byte. (Unlike IVF/HNSW, a wider LSH radius
    probes NEW buckets, so equality is only claimed in these two
    regimes, where both runs stop at the same radius.)"""
    from hybrid_vector_search_spark.operators.lsh import LSHPostFilterBackend

    n = emb.count()
    q = query_vector(31)
    fixed = LSHPostFilterBackend(emb, n)
    costed = LSHPostFilterBackend(emb, n, costed=True)

    strict = {"label": {"eq": 0}, "id": {"le": 100}}  # ~10 of 500 rows
    ids_f, st_f = fixed.search(q, strict, 10)
    ids_c, st_c = costed.search(q, strict, 10)
    assert st_f["ladder_entry"] == 0 and st_f["rungs_run"] == 3
    assert st_c["ladder_entry"] == 2 and st_c["rungs_run"] == 1
    assert ids_f == ids_c and st_f["scores"] == st_c["scores"]
    assert 0 < st_c["selectivity_est"] < 0.1

    broad = {}  # everything allowed
    ids_fb, st_fb = fixed.search(q, broad, 5)
    ids_cb, st_cb = costed.search(q, broad, 5)
    assert st_cb["ladder_entry"] == 0  # coverage P(0) already suffices
    assert st_fb["rungs_run"] == st_cb["rungs_run"]
    assert ids_fb == ids_cb and st_fb["scores"] == st_cb["scores"]
