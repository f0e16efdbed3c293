"""Deterministic sampling + packing operator tests."""

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import sampling as SP


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # lang en: ids 0..5 with 4 tokens each; id 6 is a 9-token giant
        *[(i, "en", "tok " * 3 + "end") for i in range(6)],
        (6, "en", " ".join(f"w{j}" for j in range(9))),
        # lang de: two short docs
        (10, "de", "ein zwei drei"),
        (11, "de", "vier funf"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hash_sample_sticky_subset(docs):
    small = {r.doc_id for r in SP.hash_sample(docs, "doc_id", 0.3).collect()}
    big = {r.doc_id for r in SP.hash_sample(docs, "doc_id", 0.6).collect()}
    assert small <= big  # membership depends only on the key hash
    again = {r.doc_id for r in SP.hash_sample(docs, "doc_id", 0.3).collect()}
    assert small == again  # reproducible across runs


def test_hash_sample_extremes(docs):
    assert SP.hash_sample(docs, "doc_id", 0.0).count() == 0
    assert SP.hash_sample(docs, "doc_id", 1.0).count() == docs.count()


def test_stratified_sample_exact_n(docs):
    out = SP.stratified_sample(docs, ["lang"], "doc_id", 3)
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang == {"en": 3, "de": 2}  # min(n, |stratum|)
    # deterministic draw
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in SP.stratified_sample(docs, ["lang"], "doc_id", 3).collect()
    )
    assert a == b


def test_pack_sequences_next_fit(docs):
    out = {
        r.doc_id: r
        for r in SP.pack_sequences(docs, 8, strata=["lang"]).collect()
    }
    # en: 4-token docs at offsets 0,4,8,... -> pack = offset // 8
    assert [out[i].pack_id for i in range(6)] == [0, 0, 1, 1, 2, 2]
    # the 9-token giant starts at offset 24 -> pack 3, never split
    assert out[6].n_tokens == 9 and out[6].pack_id == 3
    # de packs independently of en
    assert out[10].pack_id == 0 and out[11].pack_id == 0


def test_pack_respects_strata_boundaries(docs):
    out = SP.pack_sequences(docs, 8, strata=["lang"])
    # (lang, pack_id) token sums: only a pack containing a doc that
    # crosses the boundary may exceed the budget (next-fit, no splits)
    sums = out.groupBy("lang", "pack_id").agg(
        F.sum("n_tokens").alias("tok"), F.count("*").alias("n")
    )
    for r in sums.collect():
        assert r.tok <= 8 or r.n == 1


def test_resample_mixture_budget_and_determinism(spark):
    from hybrid_vector_search_spark.plans.registry import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    out = QUERIES["docs_resample_mixture"](spark, sf_dir).toPandas()
    out2 = QUERIES["docs_resample_mixture"](spark, sf_dir).toPandas()
    # bit-stable across runs (hash-threshold, not df.sample)
    assert out.equals(out2)
    # rates clamp at 1.0 and keep counts never exceed the population
    assert (out.rate <= 1.0).all() and (out.rate > 0).all()
    assert (out.n_kept <= out.n_docs).all()
    # sources hitting the clamp keep everything
    clamped = out[out.rate >= 1.0]
    assert (clamped.n_kept == clamped.n_docs).all()
    assert len(clamped) > 0  # the skewed weights make the clamp reachable
    # total kept tracks the budget (hash sampling is binomial per source)
    total, kept = out.n_docs.sum(), out.n_kept.sum()
    assert abs(kept / total - 0.8) < 0.15


def test_weighted_sample_rejects_non_positive_weights(docs):
    """Advisor r9: E-S requires strictly positive weights — w=0 gives
    ±inf keys and w<0 flips ln(u)/w positive so those rows always win.
    The in-expression guard fails the draw loudly instead."""
    bad = docs.withColumn(
        "w", F.when(F.col("doc_id") == 6, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    with pytest.raises(Exception, match="strictly positive"):
        SP.weighted_sample(bad, "doc_id", F.col("w"), 3).collect()
    neg = docs.withColumn("w", F.lit(-2.0))
    with pytest.raises(Exception, match="strictly positive"):
        SP.weighted_sample(neg, "doc_id", F.col("w"), 3).collect()
    # positive weights still draw deterministically
    ok = docs.withColumn("w", F.lit(1.0) + F.col("doc_id").cast("double"))
    a = sorted(
        r.doc_id
        for r in SP.weighted_sample(ok, "doc_id", F.col("w"), 4).collect()
    )
    b = sorted(
        r.doc_id
        for r in SP.weighted_sample(ok, "doc_id", F.col("w"), 4).collect()
    )
    assert a == b and len(a) == 4
