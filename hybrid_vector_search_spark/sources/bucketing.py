"""Bucketed storage: shuffle-free id joins for the embeddings⋈metadata
corpus at scale.

The wide-corpus join (``load_corpus``) shuffles both sides on ``id`` every
run. At 100 TB that shuffle dominates; the fix is to pay it once at write
time: ``bucketBy(n, id)`` + ``sortBy(id)`` persists both tables pre-hashed
into the same bucket layout, after which every equi-join (and groupBy) on
``id`` is planned with ZERO Exchange — each task zips bucket i of one
table with bucket i of the other (sort-merge without sort, since buckets
are written sorted).

Bucket count guidance: ``total_size / bucket_count ≈ 128-512 MB`` per
bucket per partition so tasks stay memory-resident; both join sides MUST
use the same count (Spark only elides the shuffle when bucket specs
match).

Bucketed tables go through the session catalog (``saveAsTable``) — bucket
metadata lives in the metastore, not the parquet footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``key``.
    With ``path`` the table is external (data at the given location,
    bucket spec in the catalog)."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_corpus_tables(
    spark: SparkSession,
    embeddings: DataFrame,
    documents: DataFrame,
    n_buckets: int = 8,
    prefix: str = "corpus",
    base_path: str | None = None,
) -> DataFrame:
    """Write both corpus sides bucketed on id and return the co-located
    join — the scale-path replacement for ``load_corpus``'s shuffle join."""
    write_bucketed(
        embeddings.withColumnRenamed("vec_id", "id"),
        f"{prefix}_embeddings",
        "id",
        n_buckets,
        path=f"{base_path}/{prefix}_embeddings" if base_path else None,
    )
    write_bucketed(
        documents.withColumnRenamed("doc_id", "id"),
        f"{prefix}_documents",
        "id",
        n_buckets,
        path=f"{base_path}/{prefix}_documents" if base_path else None,
    )
    emb = spark.table(f"{prefix}_embeddings")
    docs = spark.table(f"{prefix}_documents")
    return emb.join(docs, "id", "left")
