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
