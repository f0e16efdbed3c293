"""Bucketed corpus join plans with zero Exchange (shuffle elision)."""

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.sources.bucketing import bucketed_corpus_tables
from hybrid_vector_search_spark.sources.loaders import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def no_broadcast(spark):
    """Force real join planning — broadcast would hide the shuffle."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")

    # baseline: the plain join of unbucketed parquet shuffles both sides
    plain = emb.withColumnRenamed("vec_id", "id").join(
        docs.withColumnRenamed("doc_id", "id"), "id", "left"
    )
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan

    joined = bucketed_corpus_tables(
        spark, emb, docs, n_buckets=4, base_path=str(tmp_path / "bkt")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket-aligned: shuffle elided
    assert joined.count() == emb.count()
    # and an aggregation on the bucket key also skips the shuffle
    agg = spark.table("corpus_embeddings").groupBy("id").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in agg_plan

    for t in ("corpus_embeddings", "corpus_documents"):
        spark.sql(f"DROP VIEW IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__b4")


def test_q18_bucketed_matches_plain_and_elides_shuffle(spark):
    """The registered bucketed Q18 returns byte-identical rows to the
    plain Q18 and its plan has ZERO shuffle Exchange — the only
    exchanges are dim broadcasts."""
    from hybrid_vector_search_spark.plans import registry as R

    plain = R.QUERIES["tpch_q18_large_orders"](spark, SF_DIR).collect()
    bucketed_df = R.QUERIES["tpch_q18_bucketed"](spark, SF_DIR)
    bucketed = bucketed_df.collect()
    assert [r.asDict() for r in plain] == [r.asDict() for r in bucketed]

    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan  # the merge hint kept the real join


def test_hypertable_day_range_prunes_partitions(spark):
    """The day-partitioned events scan carries PartitionFilters for the
    bounded range — pruned listing, not a full-history scan."""
    import re

    from hybrid_vector_search_spark.plans import registry as R

    df = R.QUERIES["events_hypertable_day_range"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1)
    days = {r["day"] for r in df.collect()}
    assert days <= {"2024-01-08", "2024-01-09", "2024-01-10"}


def test_corpus_bucketed_profile_single_agg_exchange(spark, no_broadcast):
    """The registered bucketed corpus profile shuffles ONLY for the tiny
    (label, lang) aggregate — the wide embeddings⋈documents join itself
    is Exchange-free on the bucketed layout. Broadcast is disabled so the
    plan must take the bucket-aligned SortMergeJoin (at test scale
    Catalyst would otherwise broadcast the corpus and prove nothing)."""
    from hybrid_vector_search_spark.plans import registry as R

    # bypass the prepared-plan memo: the memoized plan may have been
    # built under the default broadcast threshold
    fn = getattr(R.QUERIES["corpus_bucketed_profile"], "__wrapped__")
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert df.count() > 0


def test_derive_bucket_count_volume_scaling(spark):
    """The derived count is a power of two, never below the cluster
    parallelism, and grows with the bytes/target ratio — the r10 fix for
    a pinned count capping join parallelism as data grows."""
    from hybrid_vector_search_spark.sources.bucketing import (
        MAX_BUCKETS,
        derive_bucket_count,
        plan_size_bytes,
    )

    docs = load_table(spark, SF_DIR, "documents")
    floor = spark.sparkContext.defaultParallelism
    n_small = derive_bucket_count(spark, docs)
    assert n_small >= floor and (n_small & (n_small - 1)) == 0

    bytes_ = plan_size_bytes(docs)
    assert bytes_ > 0
    # shrink the target so the bytes term dominates: a 16x-outgrown
    # layout must derive a 16x (pow2-rounded) larger count
    n_big = derive_bucket_count(spark, docs, target_bytes=max(bytes_ // 64, 1))
    assert n_big >= 64 and (n_big & (n_big - 1)) == 0
    assert n_big > n_small or n_small >= 64
    # and the cap holds
    assert derive_bucket_count(spark, docs, target_bytes=1) == MAX_BUCKETS


def test_rebucket_if_outgrown(spark, no_broadcast, tmp_path):
    """A layout whose volume outgrew its bucket count is rewritten at the
    re-derived count (growth-only: an adequate layout is a no-op); after
    re-bucketing BOTH sides, the join is still Exchange-free."""
    from hybrid_vector_search_spark.sources.bucketing import (
        current_bucket_count,
        plan_size_bytes,
        rebucket_if_outgrown,
        write_bucketed,
    )

    emb = load_table(spark, SF_DIR, "embeddings").withColumnRenamed(
        "vec_id", "id"
    )
    docs = load_table(spark, SF_DIR, "documents").withColumnRenamed(
        "doc_id", "id"
    )
    # start at the parallelism floor: the derived count never drops below
    # it, so a smaller initial layout is always "outgrown"
    p = spark.sparkContext.defaultParallelism
    n0 = 1 << (p - 1).bit_length()
    for name, df in (("rb_emb", emb), ("rb_docs", docs)):
        write_bucketed(df, name, "id", n0, path=str(tmp_path / name))
    assert current_bucket_count(spark, "rb_emb") == n0
    n_rows = spark.table("rb_emb").count()

    # adequate layout (huge target): no-op
    assert (
        rebucket_if_outgrown(
            spark, "rb_emb", "id", target_bytes=1 << 40,
            path=str(tmp_path / "rb_emb_v2"),
        )
        == n0
    )

    # outgrown layout (tiny target): rewritten at a larger derived count,
    # rows preserved under the swap
    tiny = max(plan_size_bytes(spark.table("rb_emb")) // (4 * n0), 1)
    n1 = rebucket_if_outgrown(
        spark, "rb_emb", "id", target_bytes=tiny,
        path=str(tmp_path / "rb_emb_v3"),
    )
    assert n1 > n0 and n1 == current_bucket_count(spark, "rb_emb")
    assert spark.table("rb_emb").count() == n_rows

    # co-bucketed group contract: align the peer to the GROUP count (the
    # one derived from the largest side), after which the join is still
    # Exchange-free at the new layout
    write_bucketed(
        spark.table("rb_docs"), "rb_docs2", "id", n1,
        path=str(tmp_path / "rb_docs_v3"),
    )
    j = spark.table("rb_emb").join(spark.table("rb_docs2"), "id", "left")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # view-from-birth (r13): EVERY name is a view over a versioned
    # physical layout, from the very first write
    for name in ("rb_emb", "rb_docs", "rb_docs2"):
        assert spark.catalog.getTable(name).tableType.upper() == "VIEW"
    for name in ("rb_emb", "rb_docs", "rb_docs2"):
        spark.sql(f"DROP VIEW IF EXISTS {name}")
    for row in spark.sql("SHOW TABLES").collect():
        if row["tableName"].startswith(("rb_emb__b", "rb_docs")):
            spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")


def test_rebucket_swap_is_reader_safe(spark, tmp_path):
    """A reader racing the rebucket swap never sees a missing table:
    the name is view-backed FROM THE FIRST WRITE (r13), so publishing a
    bigger layout — including the very first rebucket of the table's
    life — is ONE catalog update (CREATE OR REPLACE VIEW), and old
    files outlive the swap for in-flight scans (external location). A
    continuous reader thread counts the table across the first and
    every subsequent forced rebucket — every read must succeed and see
    the full row count."""
    import threading

    from hybrid_vector_search_spark.errors import ValidationError
    from hybrid_vector_search_spark.sources.bucketing import (
        plan_size_bytes,
        rebucket_if_outgrown,
        write_bucketed,
    )

    df = load_table(spark, SF_DIR, "documents").withColumnRenamed(
        "doc_id", "id"
    )
    n_rows = df.count()
    p = spark.sparkContext.defaultParallelism
    n0 = 1 << (p - 1).bit_length()
    write_bucketed(df, "rs_docs", "id", n0, path=str(tmp_path / "v0"))
    # view-from-birth: no plain-table era, no upgrade window to race
    assert spark.catalog.getTable("rs_docs").tableType.upper() == "VIEW"

    # ADVICE guard: staging into the table's CURRENT location raises
    # instead of overwriting the files the rewrite is scanning
    with pytest.raises(ValidationError, match="CURRENT location"):
        rebucket_if_outgrown(
            spark, "rs_docs", "id", target_bytes=1,
            path=str(tmp_path / "v0"),
        )

    errs: list = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                assert spark.table("rs_docs").count() == n_rows
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        # the FIRST rebucket runs under the racing reader too (r13:
        # the r12 design documented it as a maintenance-window step)
        n_prev = n0
        for gen in (1, 2, 3):
            tiny = max(
                plan_size_bytes(spark.table("rs_docs")) // (4 * n_prev), 1
            )
            n_next = rebucket_if_outgrown(
                spark, "rs_docs", "id", target_bytes=tiny,
                path=str(tmp_path / f"v{gen}"), drop_old=False,
            )
            assert n_next > n_prev
            n_prev = n_next
    finally:
        stop.set()
        t.join(120)
    assert errs == []
    assert spark.table("rs_docs").count() == n_rows
    spark.sql("DROP VIEW IF EXISTS rs_docs")
    for row in spark.sql("SHOW TABLES").collect():
        if row["tableName"].startswith("rs_docs__b"):
            spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")
