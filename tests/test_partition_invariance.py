"""Partition-count invariance: results must not depend on physical layout.

At 100 TB the same table arrives with wildly different split counts per
run (file compaction, AQE coalescing, cluster size); any operator whose
OUTPUT depends on the partitioning is silently nondeterministic at scale.
These tests pin the invariant for the operators that compute their own
keys/ids/samples — the ones where a layout dependence could actually
creep in (hash sampling, minhash signatures, PQ codes, distributed id
assignment)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import dedup as DD
from hybrid_vector_search_spark.operators import pq as PQ
from hybrid_vector_search_spark.operators import sampling as SP
from hybrid_vector_search_spark.sources.etl import assign_contiguous_ids


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i % 7} common text value row {i} " * 3, f"src{i % 3}")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")


def _with_layouts(df, fn):
    """Evaluate fn under three different physical layouts."""
    outs = []
    for layout in (df.coalesce(1), df.repartition(7), df.repartition(23, "doc_id")):
        outs.append(fn(layout))
    return outs


def test_hash_sample_partition_invariant(docs):
    def kept(df):
        return sorted(
            r.doc_id
            for r in df.filter(
                SP.portable_hash_key(F.col("doc_id"))
                < int(0.4 * SP.HASH_SPACE)
            ).collect()
        )

    a, b, c = _with_layouts(docs, kept)
    assert a == b == c and 0 < len(a) < 60


def test_minhash_signatures_partition_invariant(docs):
    def sigs(df):
        return {
            r.doc_id: tuple(r.sig)
            for r in DD.minhash_signatures(df).collect()
        }

    a, b, c = _with_layouts(docs, sigs)
    assert a == b == c


def test_pq_codes_partition_invariant(spark):
    rng = np.random.default_rng(3)
    rows = [
        (i, (lambda v: (v / np.linalg.norm(v)).astype(np.float32).tolist())(
            rng.standard_normal(64)
        ))
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "id LONG, embedding ARRAY<FLOAT>")
    books = PQ.pq_codebooks(64)

    def codes(df):
        return {r.id: tuple(r.codes) for r in PQ.pq_encode(df, books).collect()}

    a = codes(emb.coalesce(1))
    b = codes(emb.repartition(9))
    assert a == b


def test_assign_contiguous_ids_partition_invariant(docs):
    """Ids 0..N-1 ordered by the key, identical for any partition count —
    including num_partitions larger than the row count."""
    def ids(df, nparts):
        out = assign_contiguous_ids(df, "doc_id", num_partitions=nparts)
        return [(r.doc_id, r.id) for r in out.orderBy("doc_id").collect()]

    base = ids(docs, 1)
    assert base == ids(docs.repartition(13), 4)
    assert base == ids(docs.coalesce(2), 128)
    got_ids = [i for _, i in base]
    assert got_ids == list(range(60))


def test_unigram_surprisal_grid_partition_invariant(docs):
    """The per-doc surprisal SUM is an order-dependent double
    accumulation — the raw sum differs by ULPs across layouts. The
    registered query snaps it through grid_avg before comparison; this
    pins that the GRID-SNAPPED value is layout-invariant (the property
    the DuckDB hash-compare relies on)."""
    from hybrid_vector_search_spark.functions.portable import grid_avg

    def vals(df):
        tok = df.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("term"),
        ).filter(F.col("term") != "")
        tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        total = tok.count()
        perdoc = (
            tok.join(tc, "term")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_toks"),
                F.sum(
                    F.log2(F.lit(float(total)) / F.col("cnt"))
                ).alias("sum_bits"),
            )
        )
        out = perdoc.select(
            "doc_id",
            grid_avg(F.col("sum_bits"), F.col("n_toks"), 2, 6).alias("b"),
        )
        return {r.doc_id: r.b for r in out.collect()}

    a, b, c = _with_layouts(docs, vals)
    assert a == b == c and len(a) == 60


def test_bigram_repetition_partition_invariant(docs):
    """Per-row pure function — trivially invariant, pinned anyway since
    it feeds quality gates."""
    from hybrid_vector_search_spark.functions.text import bigram_repetition

    def vals(df):
        return {
            r.doc_id: r.rep
            for r in df.select(
                "doc_id", F.round(bigram_repetition("text"), 6).alias("rep")
            ).collect()
        }

    a, b, c = _with_layouts(docs, vals)
    assert a == b == c


def test_spread_no_shuffle_on_already_parallel_scans(spark, tmp_path, docs):
    """spread() contract (r1 VERDICT minor #5 + r2 review): multi-split
    inputs pass through untouched; only single-file / local-relation
    inputs are repartitioned up to the session parallelism."""
    from hybrid_vector_search_spark.sources.loaders import spread

    target = spark.sparkContext.defaultParallelism

    # many-file scan: pass-through, object identity (no plan change)
    many = str(tmp_path / "many")
    docs.repartition(target).write.parquet(many)
    df_many = spark.read.parquet(many)
    assert spread(df_many) is df_many

    # single-file scan: spread to the session parallelism
    one = str(tmp_path / "one")
    docs.coalesce(1).write.parquet(one)
    df_one = spark.read.parquet(one)
    assert spread(df_one).rdd.getNumPartitions() == target

    # already-parallel non-file plan: pass-through
    wide = docs.repartition(target)
    assert spread(wide) is wide
