"""r16: per-(root, version) snapshot-plan memo (manifest.read_snapshot).

The memo must (a) return the SAME lazy DataFrame for repeated reads of an
unchanged committed version — skipping ~100 py4j round trips of plan
build per call; (b) never serve a plan across a descriptor change (new
commit = new version key; descriptor rewrite = token rotation); and
(c) honor both invalidation paths (explicit invalidate_snapshot_plans,
purge's resident invalidation). Results must stay action-fresh: the memo
holds a lazy plan, every collect re-executes it.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.sources import manifest as M


@pytest.fixture()
def root(tmp_path, spark):
    r = str(tmp_path / "tbl")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("label")
    )
    M.commit_append(r, df)
    return r


def test_memo_hit_same_session_same_version(spark, root):
    a = M.read_snapshot(spark, root)
    b = M.read_snapshot(spark, root)
    assert a is b  # plan reused, not rebuilt
    # and the plan still computes (lazy — every action re-executes)
    assert a.count() == 10


def test_new_commit_yields_new_plan_and_rows(spark, root):
    v1 = M.current_version(root)
    a = M.read_snapshot(spark, root)
    extra = spark.range(10, 15).select(
        F.col("id"), (F.col("id") % 3).alias("label")
    )
    M.commit_append(root, extra)
    b = M.read_snapshot(spark, root)  # resolves the NEW current version
    assert b is not a
    assert b.count() == 15
    # pinned old version still readable (and memo-hit on repeat)
    old = M.read_snapshot(spark, root, version=v1)
    assert old.count() == 10
    assert M.read_snapshot(spark, root, version=v1) is old


def test_descriptor_rewrite_rotates_token(spark, root):
    v = M.current_version(root)
    a = M.read_snapshot(spark, root)
    p = os.path.join(root, M._manifest_name(v))
    # simulate an in-place descriptor replacement (sidecar compaction /
    # out-of-band regeneration): same path, fresh mtime
    content = open(p, encoding="utf-8").read()
    time.sleep(0.01)
    with open(p, "w", encoding="utf-8") as f:
        f.write(content)
    b = M.read_snapshot(spark, root)
    assert b is not a
    assert b.count() == 10


def test_invalidate_snapshot_plans_scopes(spark, root):
    a = M.read_snapshot(spark, root)
    M.invalidate_snapshot_plans("/nonexistent/elsewhere")
    assert M.read_snapshot(spark, root) is a  # unrelated root untouched
    M.invalidate_snapshot_plans(root)
    b = M.read_snapshot(spark, root)
    assert b is not a
    M.invalidate_snapshot_plans()  # clear-all form
    assert M.read_snapshot(spark, root) is not b


def test_memo_entries_capped(spark, tmp_path):
    # FIFO eviction keeps the memo bounded
    start = len(M._SNAPSHOT_DF_MEMO)
    cap = M._SNAPSHOT_DF_MEMO_MAX
    assert start <= cap
    r = str(tmp_path / "capped")
    df = spark.range(3).select(F.col("id"), F.lit(0).alias("label"))
    M.commit_append(r, df)
    M.read_snapshot(spark, r)
    assert len(M._SNAPSHOT_DF_MEMO) <= cap
