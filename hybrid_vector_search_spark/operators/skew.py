"""Skew-resilient joins: explicit key salting for hot keys.

Spark's own defenses cover most skew: AQE skew-join splits oversized
partitions (sort-merge joins only) and ``broadcast()`` removes the
shuffle entirely when one side fits an executor. The gap is a *shuffled*
join — dim too big to broadcast, or a hash join AQE will not split —
where one hot key (the null-ish user, the default tenant, the empty
document) funnels its entire posting list through ONE reducer. Salting
closes it: the fact side gets a deterministic salt in ``[0, n_salt)``,
the dim side is replicated ``n_salt`` times, and the join key becomes
``(key, salt)`` — a hot key's rows now spread over ``n_salt`` reducers.

The salt must be DETERMINISTIC per row (this repo's partition-invariance
rule: results never depend on physical layout, so ``rand()`` and
``monotonically_increasing_id()`` are both banned). Default: xxhash64
over the fact side's non-key columns — rows identical in every column
share a salt, which is correct (they are indistinguishable) and still
spreads a hot KEY as long as its rows differ anywhere.

Cost model: the dim side is shuffled ``n_salt``× (it is exploded before
the exchange). Worth it only when the dim is far smaller than the fact
table but too big to broadcast — exactly the regime between
``broadcast()`` and a plain shuffle join. Size ``n_salt`` to the hot
key's excess: rows_of_hottest_key / rows_per_healthy_partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
    salt_on=None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with the fact side salted and
    the dim side replicated ``n_salt`` times.

    Only ``inner`` and ``left`` are supported: replicating the dim side
    would multiply unmatched dim rows under right/full joins. Unmatched
    fact rows under ``left`` keep exactly one output row (their single
    salt value), so left semantics are preserved.

    ``salt_on``: optional Column supplying the salt hash basis (e.g. a
    unique row id). Default hashes every non-key fact column.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: a replicated "
            "dim side breaks right/full-outer semantics"
        )
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    for side, cols in (("fact", fact.columns), ("dim", dim.columns)):
        if _SALT in cols:
            raise ValueError(
                f"{side} side already has a {_SALT!r} column — it would "
                "be silently overwritten and dropped (rename it first)"
            )
    if salt_on is None:
        basis = [F.col(c) for c in fact.columns if c != key]
        if not basis:  # key-only fact side: all rows of a key identical
            basis = [F.col(key)]
        salt_on = F.xxhash64(*basis)
    f = fact.withColumn(
        _SALT, F.pmod(salt_on, F.lit(n_salt)).cast("int")
    )
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return f.join(d, [key, _SALT], how).drop(_SALT)


def salted_self_pairs(
    rows: DataFrame,
    key: str,
    id_col: str,
    n_salt: int = 8,
    hot_threshold: int = 256,
) -> DataFrame:
    """Skew-resilient SELF-join pair generation: all ``(a, b)`` with
    ``a.key == b.key`` and ``a.id < b.id`` — the shape of every
    inverted-index candidate join (MinHash band keys, SimHash pigeonhole
    bands, shingle postings).

    A plain self-join funnels a hot key's whole posting list through ONE
    reducer that then emits (and compares) L² pairs. Salting a self-join
    needs the TRIANGLE scheme, not :func:`salted_join`'s fact×dim shape:
    each row gets a deterministic salt ``s(id) ∈ [0, n_salt)``; the left
    side replicates over every partner salt ``sb`` and the right side
    over every ``sa``, joining on ``(key, sa, sb)`` — each pair meets in
    exactly one of the ``n_salt²`` reducers, so the hot key's L² work
    spreads evenly instead of serializing.

    Replicating every posting ``n_salt``× would tax the (typical) skew-
    free case, so the split is gated by a DF threshold, the same hazard
    model as the dedup df-cap: keys with posting length ≤
    ``hot_threshold`` take the plain one-shuffle self-join; only hot
    keys' rows pay the replication. The hot-key list is an aggregate of
    the posting table — small by construction for any sane threshold —
    and broadcasts into semi/anti splits, adding zero shuffles to the
    cold path. Output (id_a, id_b) is identical to the plain self-join's
    pair set — proven by the registry query's unsalted oracle and the
    skewed-fixture pytest.
    """
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    for c in ("__sa", "__sb"):
        if c in rows.columns:
            raise ValueError(f"rows already has a {c!r} column")
    counts = rows.groupBy(key).agg(F.count(F.lit(1)).alias("__df"))
    hot = counts.filter(F.col("__df") > hot_threshold).select(key)

    def pair_select(df_a: DataFrame, df_b: DataFrame, extra: list) -> DataFrame:
        return df_a.alias("a").join(
            df_b.alias("b"),
            [
                F.col(f"a.{key}") == F.col(f"b.{key}"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                *extra,
            ],
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )

    cold = rows.join(F.broadcast(hot), key, "left_anti")
    cold_pairs = pair_select(cold, cold, [])

    hotr = rows.join(F.broadcast(hot), key, "left_semi")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("int")
    partner = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    left = hotr.withColumn("__sa", salt).withColumn("__sb", partner)
    right = hotr.withColumn("__sb", salt).withColumn("__sa", partner)
    hot_pairs = pair_select(
        left,
        right,
        [
            F.col("a.__sa") == F.col("b.__sa"),
            F.col("a.__sb") == F.col("b.__sb"),
        ],
    )
    return cold_pairs.unionByName(hot_pairs)
