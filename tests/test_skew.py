"""Salted-join semantics: identical results to the plain join under any
layout and salt count; hot keys actually spread across salts."""

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (user 7: 5000 rows) among 50 healthy keys
    rows = [(7, i, float(i % 13)) for i in range(5000)] + [
        (u, 10_000 + u * 7 + j, float(j)) for u in range(50) for j in range(3)
    ]
    fact = spark.createDataFrame(rows, "user_id LONG, event_id LONG, value DOUBLE")
    dim = spark.createDataFrame(
        [(u, f"seg{u % 4}") for u in list(range(50)) + [7]],
        "user_id LONG, segment STRING",
    ).distinct()
    return fact, dim


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_salted_inner_equals_plain(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "user_id")
    salted = salted_join(fact, dim, "user_id", n_salt=8)
    assert _as_set(salted.select(*sorted(salted.columns))) == _as_set(
        plain.select(*sorted(plain.columns))
    )


def test_salted_left_keeps_unmatched_once(spark, skewed):
    fact, dim = skewed
    extra = fact.union(
        spark.createDataFrame([(999, 1, 0.0)], fact.schema)  # no dim row
    )
    out = salted_join(extra, dim, "user_id", n_salt=8, how="left")
    unmatched = out.filter(F.col("user_id") == 999).collect()
    assert len(unmatched) == 1 and unmatched[0].segment is None


def test_salt_spreads_hot_key(skewed):
    fact, dim = skewed
    from hybrid_vector_search_spark.operators.skew import _SALT

    f = fact.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in fact.columns if c != "user_id"]),
            F.lit(8),
        ),
    )
    per_salt = (
        f.filter(F.col("user_id") == 7).groupBy(_SALT).count().collect()
    )
    # the 5000-row hot key lands on all 8 salts, none dominating
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 5000 * 0.25


def test_layout_and_nsalt_invariance(skewed):
    fact, dim = skewed
    a = _as_set(salted_join(fact, dim, "user_id", n_salt=8))
    b = _as_set(salted_join(fact.repartition(17), dim.coalesce(1), "user_id", n_salt=3))
    assert a == b


def test_rejects_outer_and_bad_nsalt(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "user_id", how="full")
    with pytest.raises(ValueError, match="n_salt"):
        salted_join(fact, dim, "user_id", n_salt=0)


def test_salted_join_rejects_existing_salt_column(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact.withColumn("__salt", F.lit(1)), dim, "user_id")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact, dim.withColumn("__salt", F.lit(1)), "user_id")


@pytest.fixture(scope="module")
def skewed_postings(spark):
    """Inverted-index posting table with one hot key: band key 'HOT'
    holds 120 ids (7,140 pairs through one reducer if unsalted), plus
    200 cold keys of 2-3 ids each."""
    rows = [("HOT", i) for i in range(120)]
    for k in range(200):
        for j in range(2 + k % 2):
            rows.append((f"cold{k}", 1000 + k * 10 + j))
    return spark.createDataFrame(rows, "bk STRING, doc_id LONG")


def _plain_pairs(rows, key="bk", id_col="doc_id"):
    a, b = rows.alias("a"), rows.alias("b")
    return a.join(
        b,
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )


def test_salted_self_pairs_equals_plain(skewed_postings):
    from hybrid_vector_search_spark.operators.skew import salted_self_pairs

    plain = _as_set(_plain_pairs(skewed_postings))
    for n_salt, thresh in [(4, 8), (8, 1), (3, 10_000)]:
        salted = _as_set(
            salted_self_pairs(
                skewed_postings, "bk", "doc_id", n_salt, thresh
            )
        )
        assert salted == plain, (n_salt, thresh)


def test_salted_self_pairs_spreads_hot_key(skewed_postings):
    """Every (sa, sb) reducer cell of the hot key carries a bounded
    slice of the L² pair work — no cell re-serializes the posting."""
    n_salt = 4
    hot = skewed_postings.filter(F.col("bk") == "HOT").withColumn(
        "s", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salt)).cast("int")
    )
    per_salt = {r["s"]: r["count"] for r in hot.groupBy("s").count().collect()}
    assert len(per_salt) == n_salt
    # uniform hash: no salt bucket hoards the postings, so every reducer
    # cell's work is ~ (L/S)² instead of one cell's L²
    L = 120
    assert max(per_salt.values()) < L * 0.5


def test_salted_self_pairs_rejects_reserved_cols(skewed_postings):
    from hybrid_vector_search_spark.operators.skew import salted_self_pairs

    with pytest.raises(ValueError, match="__sa"):
        salted_self_pairs(
            skewed_postings.withColumn("__sa", F.lit(1)), "bk", "doc_id"
        )
    with pytest.raises(ValueError, match="n_salt"):
        salted_self_pairs(skewed_postings, "bk", "doc_id", n_salt=0)


def test_salted_self_pairs_layout_invariance(skewed_postings):
    from hybrid_vector_search_spark.operators.skew import salted_self_pairs

    base = _as_set(salted_self_pairs(skewed_postings, "bk", "doc_id", 4, 8))
    shuffled = _as_set(
        salted_self_pairs(
            skewed_postings.repartition(17), "bk", "doc_id", 4, 8
        )
    )
    assert base == shuffled
