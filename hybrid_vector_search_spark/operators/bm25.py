"""Persisted BM25 inverted index as a partitioned parquet layout.

The lexical twin of the vector-side layout story (IVF lists →
``partitionBy("list_id")``, LSH buckets → ``partitionBy("bucket")``): a
full-text index is postings — ``(term, doc, tf)`` — and at scale the
index IS the layout. Terms are hashed into a fixed number of bucket
partitions; querying scans ONLY the buckets of the query's terms (native
partition pruning), filters to the exact terms, and scores BM25 with the
per-term document frequencies broadcast from a tiny stats table.

Build once at ingest (one tokenize pass, two aggregations); per query the
plan reads |query terms| bucket directories regardless of corpus size —
the same bytes-∝-probes property the IVF probe has. Document length is
DENORMALIZED into the postings rows, so scoring needs no corpus-wide
join at query time; (N, total-token-count) live in a JSON sidecar like
the vector corpus meta (sources/loaders.py write_corpus_meta).

BM25 constants (k1 = 1.2, b = 0.75) and the exact expression shape match
plans/registry.py's RRF lexical leg, which is what lets a DuckDB oracle
replay scores to the rounding grid. No reference analogue — the
reference has no lexical retrieval at all (SURVEY.md §2.5 absent).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hybrid_vector_search_spark.errors import ValidationError

DEFAULT_BUCKETS = 32
K1 = 1.2
B = 0.75


def tokenize(docs: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Whitespace tokenization over lower-cased trimmed text — one explode
    pass, identical on both engines (regexp split on ``\\s+``)."""
    return (
        docs.select(
            id_col,
            F.explode(
                F.split(F.lower(F.trim(text_col)), "\\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def term_bucket(term: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver-side twin of the layout's bucket column: first 8 md5 hex
    chars of the term, mod n_buckets (operators/sampling.py portable
    hash — reproducible on any cluster shape and in SQL)."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _bucket_col(n_buckets: int) -> F.Column:
    from hybrid_vector_search_spark.operators.sampling import portable_hash_key

    return (portable_hash_key(F.col("term")) % n_buckets).cast("int")


def build_postings_layout(
    docs: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "id",
    text_col: str = "text",
) -> dict:
    """Write the inverted-index layout under ``path``:

    * ``postings/`` — ``(term, id, tf, dl)`` partitioned by the term's
      hash bucket, ONE file per bucket (pre-write ``repartition`` — the
      r7 IVF layout lesson: write-slivers, not bytes, dominate pruned
      point reads);
    * ``termstats/`` — tiny ``(term, df)`` table (broadcast at query
      time);
    * ``meta.json`` — ``{"n": N docs, "t": total tokens, "n_buckets"}``.

    One tokenize pass feeds everything. Returns the meta dict.
    """
    tok = tokenize(docs, id_col, text_col)
    n = docs.count()
    t = tok.count()
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    postings = (
        tok.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(dl, id_col)
        .withColumn("bucket", _bucket_col(n_buckets))
    )
    postings.repartition(n_buckets, "bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(path, "postings"))
    tok.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "termstats")
    )
    meta = {"n": int(n), "t": int(t), "n_buckets": int(n_buckets)}
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    return meta


def bm25_score_expr(n: int, t: int) -> F.Column:
    """The BM25 per-(doc, term) contribution over postings columns
    (tf, dl, df) — expression shape IDENTICAL to the RRF lexical leg
    (plans/registry.py) so float64 results match the SQL replay to the
    last ULP before rank-stabilizing rounds."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(K1) * (
        F.lit(1.0 - B)
        + (F.lit(B) * F.col("dl") * F.lit(n)) / F.lit(t)
    )
    return idf * ((F.col("tf") * F.lit(1.0 + K1)) / denom)


def bm25_topk_plan(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 20,
    id_col: str = "id",
) -> DataFrame:
    """Query the persisted layout: partition-prune the postings scan to
    the query terms' buckets, filter to the exact terms, broadcast-join
    the per-term df, sum BM25 per doc, top-K on the 6-decimal-rounded
    score (rank-stable across engines). Reads |distinct term buckets|
    directories — corpus size never enters the I/O bound."""
    if not terms:
        raise ValidationError("bm25_topk_plan requires at least one term")
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    buckets = sorted({term_bucket(tm, meta["n_buckets"]) for tm in terms})
    postings = spark.read.parquet(os.path.join(path, "postings"))
    stats = spark.read.parquet(os.path.join(path, "termstats")).filter(
        F.col("term").isin(list(terms))
    )
    hits = (
        postings.filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(list(terms)))
        .join(F.broadcast(stats), "term")
    )
    scored = hits.groupBy(id_col).agg(
        F.round(
            F.sum(bm25_score_expr(meta["n"], meta["t"])), 6
        ).alias("score")
    )
    from hybrid_vector_search_spark.operators.topk import topk

    return topk(scored, k, id_col=id_col)


def append_postings_batch(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
) -> dict:
    """APPEND-ONLY incremental maintenance for the postings layout — the
    lexical side of the index-maintenance story (IVF has partition-local
    upsert + compaction, the streaming sink has drain-and-swap; BM25
    postings are the easy case because new documents only ADD rows):

    * new postings ``(term, id, tf, dl)`` append into their term-bucket
      directories (one new file per touched bucket — pre-write
      repartition, the one-file-per-partition write rule; buckets
      accumulate one file per batch, bounded by batch cadence);
    * per-term df is ADDITIVE over disjoint doc sets, so the tiny
      termstats table is rewritten as ``old ∪ delta → sum`` through a
      staged write + two-rename swap (readers see old or new, never a
      mix);
    * ``meta.json`` rewrites with ``n += |batch|, t += batch tokens``.

    CONTRACT: ``new_docs`` ids must be NEW (no updates/deletes — those
    need a rewrite of the affected term buckets, which for text means
    effectively all of them; production text engines answer updates
    with segment tombstones + merges, out of scope here). Violating it
    double-counts the doc. BM25 scores for OLD docs change after an
    append (N, avgdl, df move) — that is correct semantics, not
    staleness: the query plan always reads current stats.

    Returns the updated meta dict.
    """
    import shutil
    import uuid

    with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])
    tok = tokenize(new_docs, id_col, text_col)
    n_delta = new_docs.count()
    t_delta = tok.count()
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    postings_new = (
        tok.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(dl, id_col)
        .withColumn("bucket", _bucket_col(n_buckets))
    )
    touched = postings_new.select("bucket").distinct().count()
    postings_new.repartition(max(touched, 1), "bucket").write.mode(
        "append"
    ).partitionBy("bucket").parquet(os.path.join(path, "postings"))

    stats_dir = os.path.join(path, "termstats")
    df_delta = tok.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    merged = (
        spark.read.parquet(stats_dir)
        .unionByName(df_delta)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    stage = f"{stats_dir}.stage-{uuid.uuid4().hex[:12]}"
    merged.coalesce(1).write.mode("overwrite").parquet(stage)
    old = f"{stats_dir}.old-{uuid.uuid4().hex[:12]}"
    os.rename(stats_dir, old)
    os.rename(stage, stats_dir)
    shutil.rmtree(old, ignore_errors=True)

    meta["n"] = int(meta["n"]) + int(n_delta)
    meta["t"] = int(meta["t"]) + int(t_delta)
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    return meta
