"""Deterministic sampling and sequence-packing operators.

Training-data pipelines need *reproducible* subsetting — a sample that
changes across runs poisons ablations — and token-budget packing that
assigns documents to fixed-capacity shards for sequence training. Both are
expressed over a portable hash (md5 hex, identical in Spark and DuckDB)
and window arithmetic so every operator here is fully oracle-checkable and
seed-stable across engines, partitionings, and cluster sizes (unlike
``df.sample``, whose output depends on partition layout).

Scale shapes:

* ``hash_sample`` — map-only (a pushable filter on a hash of the key):
  zero shuffle at any scale; the 100 TB default.
* ``stratified_sample`` — exact n-per-stratum via a window on the stratum
  key: one shuffle; hash-ordered so it is a uniform random draw per
  stratum, yet bit-reproducible.
* ``pack_sequences`` — next-fit packing by cumulative token offset: one
  window shuffle per stratum; pack ids are stable under re-execution
  because the order key is (id), not arrival order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hybrid_vector_search_spark.functions.text import ws_token_count

# 16^8: the hash key space of the first 8 md5 hex chars.
HASH_SPACE = 1 << 32


def portable_hash_key(col: Column) -> Column:
    """Uniform deterministic key in [0, 2^32): first 8 md5 hex chars of
    the value rendered as a string. DuckDB mirror:
    ``('0x' || substr(md5(x::VARCHAR), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def portable_hash_key_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}::VARCHAR), 1, 8))::BIGINT"


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by key hash — map-only, no
    shuffle, reproducible on any cluster shape, and membership is sticky:
    a row's fate depends only on its key, so incremental reruns over
    grown datasets keep previously-sampled rows (the property that makes
    hash sampling the standard for training corpora)."""
    cut = int(fraction * HASH_SPACE)
    return df.filter(portable_hash_key(F.col(key)) < F.lit(cut))


def hash_sample_where_sql(key_expr: str, fraction: float) -> str:
    cut = int(fraction * HASH_SPACE)
    return f"{portable_hash_key_sql(key_expr)} < {cut}"


def hash_key_lt_threshold_sql(key_expr: str, rate_expr: str) -> str:
    """Keep test against a *column-valued* rate (data-dependent sampling,
    e.g. mixture resampling): hash(key) < floor(rate · 2^32). The floor
    keeps the compare on integers so both engines decide identically."""
    return (
        f"{portable_hash_key_sql(key_expr)} "
        f"< CAST(floor(({rate_expr}) * {float(HASH_SPACE)}) AS BIGINT)"
    )


def stratified_sample(
    df: DataFrame, strata: list[str], key: str, n_per_stratum: int
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, drawn uniformly by
    hash order (deterministic reservoir): rank rows within each stratum by
    (hash(key), key) and keep the first n. One window shuffle on the
    strata columns."""
    w = Window.partitionBy(*strata).orderBy(
        portable_hash_key(F.col(key)), F.col(key)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    strata: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a token-budget pack: next-fit by cumulative
    token offset in deterministic id order, partitioned by ``strata``
    (e.g. language — packs should not mix languages).

    ``pack_id = floor(cum_tokens_before / budget)``: a document starts a
    new pack when the running offset crosses the budget boundary.
    Documents longer than the budget get a pack of their own (next-fit
    never splits a document). Integer window arithmetic — bit-identical
    in any engine; floor() is explicit because Spark's long cast truncates
    while DuckDB's rounds."""
    strata = strata or []
    tok = ws_token_count(F.col(text_col))
    w = (
        Window.partitionBy(*strata)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select(
            id_col, *strata, tok.cast("long").alias("n_tokens")
        )
        .withColumn(
            "pack_id",
            F.floor(before / F.lit(budget_tokens)).cast("long"),
        )
    )


def pack_sequences_sql(
    budget_tokens: int,
    strata: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    strata = strata or []
    part = f"PARTITION BY {', '.join(strata)} " if strata else ""
    cols = ", ".join([id_col, *strata])
    tok = f"len(regexp_split_to_array(lower(trim({text_col})), '\\s+'))"
    return f"""SELECT {cols}, n_tokens,
  FLOOR(COALESCE(SUM(n_tokens) OVER (
    {part}ORDER BY {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    / {budget_tokens})::BIGINT AS pack_id
FROM (SELECT {cols}, {tok}::BIGINT AS n_tokens FROM documents) t"""


def weighted_sample(
    df: DataFrame, key: str, weight: Column, n: int
) -> DataFrame:
    """WEIGHTED reservoir sample, deterministic and sticky — the
    quality-weighted draw a training-data mixer runs ("sample 1M docs
    with probability ∝ quality score"): Efraimidis–Spirakis A-Res keys
    each row with ``u^(1/w)`` (u = uniform hash of the key) and keeps
    the global top-``n``; here ranked by the monotone-equivalent
    ``ln(u)/w`` so both engines evaluate ONE transcendental (the same
    ln both already bit-match in the BM25 scorer). Map-side key
    computation + one bounded TakeOrderedAndProject — no shuffle wider
    than n at any scale. Membership depends only on (key, weight):
    reruns over grown corpora keep previously drawn rows whose keys
    still rank, the hash-sample stickiness argument weighted."""
    u = (portable_hash_key(F.col(key)) + F.lit(1).cast("double")) / F.lit(
        float(HASH_SPACE)
    )
    # Efraimidis–Spirakis precondition: w strictly positive. w=0 would
    # yield ±inf keys and a NEGATIVE w flips ln(u)/w positive so those
    # rows always win — silent wrong output. Guard in-expression
    # (JVM-side, no extra job): any null/non-positive weight fails the
    # whole draw loudly instead.
    rk = F.when(
        weight.isNull() | (weight <= F.lit(0)),
        F.raise_error(
            F.lit(
                "weighted_sample: weights must be strictly positive "
                "(Efraimidis-Spirakis precondition); got a null or "
                "non-positive weight"
            )
        ).cast("double"),
    ).otherwise(F.log(u) / weight)
    return (
        df.withColumn("__wkey", rk)
        .orderBy(F.col("__wkey").desc(), F.col(key).asc())
        .limit(n)
        .drop("__wkey")
    )


def weighted_sample_where_sql(
    key_expr: str, weight_expr: str
) -> str:
    """DuckDB mirror of :func:`weighted_sample`'s ranking key (caller
    wraps in ORDER BY ... DESC, <key> ASC LIMIT n)."""
    u = f"(({portable_hash_key_sql(key_expr)}) + 1.0) / {float(HASH_SPACE)}"
    return f"(ln({u}) / ({weight_expr}))"
