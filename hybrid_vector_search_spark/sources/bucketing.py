"""Bucketed storage: shuffle-free id joins for the embeddings⋈metadata
corpus at scale.

The wide-corpus join (``load_corpus``) shuffles both sides on ``id`` every
run. At 100 TB that shuffle dominates; the fix is to pay it once at write
time: ``bucketBy(n, id)`` + ``sortBy(id)`` persists both tables pre-hashed
into the same bucket layout, after which every equi-join (and groupBy) on
``id`` is planned with ZERO Exchange — each task zips bucket i of one
table with bucket i of the other (sort-merge without sort, since buckets
are written sorted).

Bucket-count policy (``derive_bucket_count``): the count is DERIVED from
table volume at write time, never pinned. A fixed count is a scale bug in
both directions — too few buckets caps join parallelism at the bucket
count no matter how many cores the cluster has (r10 probe: Q18 over 8
buckets ran 2.5× slower than the unbucketed join at ×16 data, 8 tasks on
32 cores each dragging a 16×-grown sorted file), too many drowns small
tables in file overhead. The rule:

    n = next_pow2(max(cluster default parallelism, bytes / target_bytes))

capped at ``MAX_BUCKETS``. The parallelism floor keeps every core busy at
any volume; the bytes term takes over once buckets would exceed the
target file size (default 128 MB of columnar bytes — large enough to
amortize task startup, small enough that a per-bucket sort-merge task
stays memory-resident). Both join sides MUST use the same count (Spark
only elides the shuffle when bucket specs match), so multi-table writers
derive ONE count from the largest side. Power-of-two counts mean a
rebucket on growth is always a clean split of the old layout.

Tables that outgrow their layout: ``rebucket_if_outgrown`` re-derives the
count from current volume and rewrites only when it increased — the
OPTIMIZE path for bucketed tables, run from the same maintenance cadence
as compaction.

Bucketed tables go through the session catalog (``saveAsTable``) — bucket
metadata lives in the metastore, not the parquet footer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_BUCKET_BYTES = 128 * 1024 * 1024
# Spark rejects bucket counts above spark.sql.sources.bucketing.maxBuckets
# (default 100000); 2^16 keeps headroom under it. Beyond the cap the
# per-bucket file grows instead (100 TB / 65536 ≈ 1.6 GB of columnar
# bytes per bucket — at that volume the table should also be
# date-partitioned, making each partition's buckets small again).
MAX_BUCKETS = 65536


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df``'s optimized plan. For a
    parquet-sourced plan this is the sum of file sizes (the right input
    to a bytes-per-bucket target: it is what the scan will read)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def derive_bucket_count(
    spark: SparkSession,
    *sides: DataFrame,
    target_bytes: int = TARGET_BUCKET_BYTES,
    max_buckets: int = MAX_BUCKETS,
) -> int:
    """Volume-derived bucket count for a co-bucketed table group: the
    next power of two ≥ max(default parallelism, largest-side bytes /
    target_bytes), capped at ``max_buckets``. One count for ALL sides —
    shuffle elision requires matching bucket specs."""
    biggest = max(plan_size_bytes(df) for df in sides)
    floor = max(
        spark.sparkContext.defaultParallelism,
        math.ceil(biggest / target_bytes),
        1,
    )
    return min(1 << (floor - 1).bit_length(), max_buckets)


def _write_bucketed_phys(
    df: DataFrame,
    phys_table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """The raw bucketed write, to a PHYSICAL catalog table name. The
    pre-write ``repartition(n, key)`` hash-aligns write tasks with
    buckets (same Murmur3 hash, same modulus) so each bucket lands as ONE
    sorted file — the layout Spark's sorted bucketed scan requires to
    elide both the Exchange and the Sort under a sort-merge join. With
    ``path`` the table is external (data at the given location, bucket
    spec in the catalog)."""
    w = df.repartition(n_buckets, F.col(key)).write.mode(mode).bucketBy(
        n_buckets, key
    )
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(phys_table)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``key``,
    published as VIEW ``table`` over the versioned physical table
    ``<table>__b<n_buckets>``.

    The view indirection exists FROM THE FIRST WRITE (r13): every later
    layout change in the table's life — including the very first
    :func:`rebucket_if_outgrown` — publishes with one atomic
    CREATE OR REPLACE VIEW, so a concurrent reader always resolves some
    complete layout. (The r12 design upgraded plain tables to views on
    first rebucket via RENAME+CREATE — two statements with a no-table
    window between them; binding the name as a view at birth erases
    that window entirely.) Plan cost of the indirection is nil: the view
    body is ``SELECT * FROM <phys>``, which the analyzer inlines, so
    bucket metadata still reaches the join planner and shuffle elision
    is unaffected (pinned by tests/test_bucketing.py plan asserts)."""
    spark = df.sparkSession
    phys = f"{table}__b{n_buckets}"
    _write_bucketed_phys(df, phys, key, n_buckets, sort, mode, path)
    try:
        t = spark.catalog.getTable(table)
        is_view = (t.tableType or "").upper() == "VIEW"
    except Exception:
        is_view = None  # name unbound
    if is_view is False:
        # legacy upgrade: a pre-r13 PLAIN table holds the public name;
        # free it (brief window, only ever paid once per legacy table)
        spark.sql(f"DROP TABLE {table}")
    spark.sql(f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM {phys}")


def _view_backing(spark: SparkSession, table: str) -> str | None:
    """The physical table behind a bucketed-layout VIEW (the indirection
    :func:`rebucket_if_outgrown` maintains), None for a plain table."""
    try:
        t = spark.catalog.getTable(table)
    except Exception:
        return None
    if (t.tableType or "").upper() != "VIEW":
        return None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row["col_name"] == "View Text":
            # written as 'SELECT * FROM <phys>' by the rebucket swap
            return row["data_type"].rsplit(None, 1)[-1].strip("`")
    return None


def table_location(spark: SparkSession, table: str) -> str | None:
    """The catalog-recorded storage location of ``table`` (None when the
    catalog records none)."""
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row["col_name"] == "Location":
            return row["data_type"]
    return None


def _same_location(a: str, b: str) -> bool:
    import os

    strip = lambda p: os.path.normpath(  # noqa: E731
        p[len("file:"):] if p.startswith("file:") else p
    )
    return strip(a) == strip(b)


def current_bucket_count(spark: SparkSession, table: str) -> int:
    """The bucket count recorded in the catalog for ``table`` (0 when the
    table is not bucketed). Resolves the view indirection a re-bucketed
    layout maintains."""
    backing = _view_backing(spark, table)
    for row in spark.sql(
        f"DESCRIBE TABLE EXTENDED {backing or table}"
    ).collect():
        if row["col_name"] == "Num Buckets":
            return int(row["data_type"])
    return 0


def rebucket_if_outgrown(
    spark: SparkSession,
    table: str,
    key: str,
    target_bytes: int = TARGET_BUCKET_BYTES,
    path: str | None = None,
    drop_old: bool = True,
) -> int:
    """OPTIMIZE for bucketed layouts: re-derive the bucket count from the
    table's CURRENT volume and rewrite only when it grew. Growth-only —
    shrinking a layout saves nothing (small buckets cost only file count)
    and would churn co-bucketed peers. Returns the (possibly new) count.

    READER-SAFE SWAP: the new layout is staged under a versioned
    physical name (``<table>__b<count>``) and published by re-pointing a
    VIEW named ``table`` at it — a single catalog update, so a
    concurrent reader resolves either the old or the new layout, never
    a missing table (the r11 DROP→RENAME pair had a no-table window
    between the statements). Since r13 :func:`write_bucketed` binds the
    public name as a view from the FIRST write, so every swap in a
    table's life — including the first — is the atomic CREATE OR
    REPLACE VIEW; only a legacy PLAIN table (created outside
    write_bucketed) still pays the one-time rename-away + create-view
    upgrade. Readers that resolved the OLD layout before the swap keep
    scanning its files: with an external ``path`` those outlive
    ``drop_old``; for managed tables pass ``drop_old=False`` and
    reclaim the superseded physical table from a later maintenance run
    instead.

    ``path`` MUST be a NEW location for the staged layout — never the
    table's current one (write_bucketed would overwrite the very files
    the rewrite is scanning); a matching location raises.

    Callers re-bucketing one table of a co-bucketed group must re-bucket
    every side to the returned count, or the group's joins fall back to
    shuffling (Spark requires matching specs)."""
    from hybrid_vector_search_spark.errors import ValidationError

    backing = _view_backing(spark, table)
    phys_old = backing or table
    df = spark.table(table)
    have = current_bucket_count(spark, table)
    want = derive_bucket_count(spark, df, target_bytes=target_bytes)
    if want <= have:
        return have
    if path is not None:
        loc = table_location(spark, phys_old)
        if loc is not None and _same_location(loc, path):
            raise ValidationError(
                f"rebucket_if_outgrown('{table}'): staging path "
                f"'{path}' is the table's CURRENT location — writing "
                f"there would overwrite the files the rewrite is "
                f"scanning; stage under a fresh location"
            )
    staged = f"{table}__b{want}"
    _write_bucketed_phys(df, staged, key, want, path=path)
    if backing is None:
        # legacy-only upgrade (pre-view plain table): free the name,
        # bind the view (the brief window documented above)
        phys_old = f"{table}__b{have}"
        spark.sql(f"ALTER TABLE {table} RENAME TO {phys_old}")
        spark.sql(f"CREATE VIEW {table} AS SELECT * FROM {staged}")
    else:
        # atomic publish: one catalog update, no no-table window
        spark.sql(
            f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM {staged}"
        )
    if drop_old:
        spark.sql(f"DROP TABLE {phys_old}")
    return want


def bucketed_corpus_tables(
    spark: SparkSession,
    embeddings: DataFrame,
    documents: DataFrame,
    n_buckets: int | None = None,
    prefix: str = "corpus",
    base_path: str | None = None,
) -> DataFrame:
    """Write both corpus sides bucketed on id and return the co-located
    join — the scale-path replacement for ``load_corpus``'s shuffle join.
    ``n_buckets`` defaults to the volume-derived count over both sides."""
    emb_df = embeddings.withColumnRenamed("vec_id", "id")
    doc_df = documents.withColumnRenamed("doc_id", "id")
    if n_buckets is None:
        n_buckets = derive_bucket_count(spark, emb_df, doc_df)
    write_bucketed(
        emb_df,
        f"{prefix}_embeddings",
        "id",
        n_buckets,
        path=f"{base_path}/{prefix}_embeddings" if base_path else None,
    )
    write_bucketed(
        doc_df,
        f"{prefix}_documents",
        "id",
        n_buckets,
        path=f"{base_path}/{prefix}_documents" if base_path else None,
    )
    emb = spark.table(f"{prefix}_embeddings")
    docs = spark.table(f"{prefix}_documents")
    return emb.join(docs, "id", "left")
