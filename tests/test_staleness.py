"""Memo/cache staleness contract (r6 VERDICT task #4).

The prepared-plan memo and artifact caches are keyed by SparkSession
identity and hold LAZY DataFrames whose input file LISTING was captured
at build time. The contract (README "Cache invalidation"; reference
parity: its harness reloads artifacts per run — src/harness/run.py:
109-112):

* an uncached ``load_table``/``load_corpus`` call always re-lists and
  re-reads — same-session mutation is visible to fresh loads;
* a memoized query is NOT invalidated by mutating its input parquet in
  place — it keeps returning the same lazy plan (whose execution over a
  mutated file is undefined: stale rows or a scan error, never a
  guarantee);
* refresh is explicit: ``registry.invalidate_caches()`` within a
  session, or a new SparkSession (``spark.newSession()`` is enough —
  every cache carries a session-identity check).
"""

import os
import shutil

import pyarrow.parquet as pq

from hybrid_vector_search_spark.plans import registry as R
from hybrid_vector_search_spark.sources.loaders import load_table

SRC = "/root/testdata/sf0.001"
TABLES = ("documents",)


def _mutable_sf_dir(tmp_path) -> str:
    d = str(tmp_path / "sf_mut")
    os.makedirs(d)
    for t in TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def test_memo_staleness_contract(spark, tmp_path):
    d = _mutable_sf_dir(tmp_path)
    q = R.QUERIES["text_token_stats"]  # one row per document, docs-only

    df1 = q(spark, d)
    r1 = df1.collect()
    n_orig = len(r1)
    assert n_orig > 100

    # memo: same (query, sf_dir, session) → the SAME lazy DataFrame
    assert q(spark, d) is df1

    # mutate the table IN PLACE: shrink documents.parquet to 100 rows
    t = pq.read_table(f"{d}/documents.parquet")
    pq.write_table(t.slice(0, 100), f"{d}/documents.tmp.parquet")
    os.replace(f"{d}/documents.tmp.parquet", f"{d}/documents.parquet")

    # (a) a FRESH load re-lists and re-reads: mutation is visible
    assert load_table(spark, d, "documents").count() == 100

    # (b) the memo does NOT watch the filesystem: same plan object back
    #     (executing it over the mutated file is undefined — not asserted)
    assert q(spark, d) is df1

    # (c) explicit same-session refresh: invalidate_caches() rebuilds
    R.invalidate_caches()
    df2 = q(spark, d)
    assert df2 is not df1
    assert len(df2.collect()) == 100

    # (d) a new session refreshes without any explicit call — each cache
    #     carries a session-identity check (the reference's
    #     reload-per-run contract)
    s2 = spark.newSession()
    df3 = q(s2, d)
    assert df3 is not df2
    assert len(df3.collect()) == 100


def test_invalidate_caches_unpersists_corpus(spark, tmp_path):
    """invalidate_caches() must also drop the cached corpus (the one
    .cache()'d artifact) so a refreshed session re-reads storage rather
    than serving resident stale blocks."""
    d = str(tmp_path / "sf_corpus")
    os.makedirs(d)
    for t in ("documents", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")

    from hybrid_vector_search_spark.sources.loaders import (
        load_corpus as _uncached_load_corpus,  # noqa: F401
    )

    c1 = R.load_corpus(spark, d)
    n1 = c1.count()
    assert R.load_corpus(spark, d) is c1  # session-memoized
    R.invalidate_caches()
    assert not c1.is_cached  # unpersisted, not leaked
    c2 = R.load_corpus(spark, d)
    assert c2 is not c1 and c2.count() == n1
