"""Partition-local IVF upsert: only touched list partitions are
rewritten, the result equals a full rebuild over the modified corpus,
and an emptied list's directory is removed (dynamic partition overwrite
would otherwise leave its stale rows behind)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.ivf import (
    IVFIndex,
    upsert_partitioned,
)

NLISTS = 6
DIM = 6


def _basis(i: int) -> list[float]:
    v = [0.0] * DIM
    v[i] = 1.0
    return v


@pytest.fixture()
def layout(spark, tmp_path):
    """20 rows, embedding = e_{id mod 6} → list_id = id mod 6 exactly
    (identity centroids make assignment trivial and auditable)."""
    cents = np.eye(NLISTS)
    rows = [(i, _basis(i % NLISTS)) for i in range(20)]
    emb = spark.createDataFrame(rows, "id long, embedding array<float>")
    path = str(tmp_path / "ivf_layout")
    IVFIndex.build_fixed(emb, cents, persist_path=path)
    return path, cents


def _dir_state(path: str, li: int) -> list[tuple[str, int, float]]:
    d = os.path.join(path, f"list_id={li}")
    return sorted(
        (f, os.path.getsize(os.path.join(d, f)),
         os.path.getmtime(os.path.join(d, f)))
        for f in os.listdir(d)
        if not f.startswith(".")
    )


def test_upsert_rewrites_only_touched_partitions(spark, layout):
    path, cents = layout
    untouched_before = {li: _dir_state(path, li) for li in (3, 4)}

    # delete EVERY row of list 5 (ids ≡ 5 mod 6) → list 5 empties;
    # move id 0 from list 0 to list 1; insert id 100 into list 2
    deletes = spark.createDataFrame(
        [(i,) for i in range(20) if i % NLISTS == 5], "id long"
    )
    upserts = spark.createDataFrame(
        [(0, _basis(1)), (100, _basis(2))],
        "id long, embedding array<float>",
    )
    out = upsert_partitioned(spark, path, cents, upserts, deletes)

    got = {
        (r["id"], r["list_id"]) for r in out.select("id", "list_id").collect()
    }
    want = {
        (i, i % NLISTS)
        for i in range(20)
        if i % NLISTS != 5 and i != 0
    } | {(0, 1), (100, 2)}
    assert got == want

    # untouched lists: byte-identical directory state (names/sizes/mtimes)
    for li in (3, 4):
        assert _dir_state(path, li) == untouched_before[li], li
    # emptied list's directory is gone, not stale
    assert not os.path.exists(os.path.join(path, "list_id=5"))

    # equals a full rebuild over the modified corpus
    rebuilt_rows = [
        (i, _basis(i % NLISTS)) for i in range(20)
        if i % NLISTS != 5 and i != 0
    ] + [(0, _basis(1)), (100, _basis(2))]
    rebuilt = IVFIndex.build_fixed(
        spark.createDataFrame(rebuilt_rows, "id long, embedding array<float>"),
        cents,
    )
    want_rebuilt = {
        (r["id"], r["list_id"])
        for r in rebuilt.assigned.select("id", "list_id").collect()
    }
    assert got == want_rebuilt


def test_upsert_empty_batch_is_noop(spark, layout):
    path, cents = layout
    before = {li: _dir_state(path, li) for li in range(NLISTS) if li != 5}
    empty_ids = spark.createDataFrame([], "id long")
    empty_up = spark.createDataFrame([], "id long, embedding array<float>")
    out = upsert_partitioned(spark, path, cents, empty_up, empty_ids)
    assert out.count() == 20
    for li, st in before.items():
        assert _dir_state(path, li) == st, li


def test_compact_partitions_only_rewrites_oversized(spark, layout):
    """Compaction coalesces only lists above the file threshold, leaves
    healthy partitions byte-identical, preserves every row, and refuses
    a streaming-sink layout (whose commit log defines its view)."""
    from hybrid_vector_search_spark.errors import ValidationError
    from hybrid_vector_search_spark.operators.ivf import compact_partitions

    path, cents = layout
    # fragment lists 0 and 1: append per-row files via a second write
    extra = spark.createDataFrame(
        [(200 + i, _basis(i % 2)) for i in range(4)],
        "id long, embedding array<float>",
    ).withColumn("list_id", (F.col("id") % 2).cast("int"))
    extra.repartition(4).write.mode("append").partitionBy(
        "list_id"
    ).parquet(path)
    before_rows = {
        (r["id"], r["list_id"])
        for r in spark.read.parquet(path).collect()
    }
    healthy_before = {li: _dir_state(path, li) for li in (2, 3, 4, 5)}
    assert len(_dir_state(path, 0)) > 1  # fragmented

    stats = compact_partitions(spark, path)
    assert stats["compacted_lists"] == 2
    assert stats["files_after"] < stats["files_before"]
    assert len(_dir_state(path, 0)) == 1
    assert len(_dir_state(path, 1)) == 1
    for li, st in healthy_before.items():
        assert _dir_state(path, li) == st, li
    after_rows = {
        (r["id"], r["list_id"])
        for r in spark.read.parquet(path).collect()
    }
    assert after_rows == before_rows

    # second pass: nothing oversized, full no-op
    stats2 = compact_partitions(spark, path)
    assert stats2["compacted_lists"] == 0
    assert stats2["files_before"] == stats2["files_after"]

    # streaming-sink layouts are refused
    import os

    os.makedirs(os.path.join(path, "_spark_metadata"), exist_ok=True)
    with pytest.raises(ValidationError, match="commit log"):
        compact_partitions(spark, path)
