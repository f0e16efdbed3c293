"""Versioned-manifest layout (sources/manifest.py): snapshot isolation,
time travel, crash-invisible commits, rewrite-without-breaking-history,
and reference-counted vacuum."""

import json
import os

import pytest

from hybrid_vector_search_spark.errors import ValidationError
from hybrid_vector_search_spark.sources import manifest as M


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 3) for i in range(lo, hi)], "id long, label int"
    )


def _ids(df):
    return {r["id"] for r in df.collect()}


def test_append_versions_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = M.commit_append(root, _df(spark, 0, 10))
    v2 = M.commit_append(root, _df(spark, 10, 15))
    assert (v1, v2) == (1, 2)
    assert M.current_version(root) == 2
    assert _ids(M.read_snapshot(spark, root)) == set(range(15))
    # time travel: v1 still serves the pre-append table
    assert _ids(M.read_snapshot(spark, root, 1)) == set(range(10))
    with pytest.raises(ValidationError, match="does not exist"):
        M.read_snapshot(spark, root, 7)


def test_pinned_reader_unaffected_by_later_commits(spark, tmp_path):
    """The reproducible-read property: a reader plan pins its file list
    at build time, so commits that land afterwards change NOTHING about
    what it scans — the snapshot a training run pins."""
    root = str(tmp_path / "tbl")
    M.commit_append(root, _df(spark, 0, 10))
    pinned = M.read_snapshot(spark, root)  # latest = v1 at pin time
    M.commit_append(root, _df(spark, 10, 99))
    assert _ids(pinned) == set(range(10))
    assert _ids(M.read_snapshot(spark, root)) == set(range(99))


def test_crashed_commit_is_invisible_and_retryable(spark, tmp_path):
    """A crash between data-file write and manifest rename leaves
    orphaned data files and (at worst) a .tmp manifest — readers still
    see the old version, and the retried commit lands cleanly."""
    root = str(tmp_path / "tbl")
    M.commit_append(root, _df(spark, 0, 10))

    # forge the crash state: data files written, manifest only as .tmp
    rels = M._write_data_files(_df(spark, 10, 20), root, 1)
    tmp = os.path.join(root, M._manifest_name(2) + ".tmp-deadbeef")
    with open(tmp, "w") as f:
        json.dump({"version": 2, "files": rels}, f)

    assert M.current_version(root) == 1  # invisible
    assert _ids(M.read_snapshot(spark, root)) == set(range(10))
    # retry commits v2 with its own data files; orphans stay invisible
    assert M.commit_append(root, _df(spark, 10, 20)) == 2
    assert _ids(M.read_snapshot(spark, root)) == set(range(20))
    # vacuum sweeps the orphaned files of the crashed attempt
    stats = M.vacuum(root, keep_last=2)
    assert stats["deleted_files"] >= 1
    assert _ids(M.read_snapshot(spark, root, 1)) == set(range(10))
    assert _ids(M.read_snapshot(spark, root, 2)) == set(range(20))


def test_rewrite_compacts_without_breaking_history(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for lo in range(0, 20, 5):  # 4 appends -> 4 data files
        M.commit_append(root, _df(spark, lo, lo + 5))
    v = M.current_version(root)
    before = _ids(M.read_snapshot(spark, root))
    v5 = M.commit_rewrite(root, M.read_snapshot(spark, root, v), n_files=1)
    _, files = M.snapshot_files(root, v5)
    assert len(files) == 1  # compacted
    assert _ids(M.read_snapshot(spark, root, v5)) == before  # same rows
    # history intact: the pre-rewrite version still reads its own files
    assert _ids(M.read_snapshot(spark, root, v)) == before
    assert _ids(M.read_snapshot(spark, root, 1)) == set(range(5))


def test_vacuum_reference_counts(spark, tmp_path):
    root = str(tmp_path / "tbl")
    M.commit_append(root, _df(spark, 0, 10))
    M.commit_append(root, _df(spark, 10, 20))
    M.commit_rewrite(root, M.read_snapshot(spark, root), n_files=1)
    stats = M.vacuum(root, keep_last=1)
    assert stats["dropped_versions"] == 2
    # the two append data files are referenced by no retained version
    assert stats["deleted_files"] == 2
    assert M.list_versions(root) == [3]
    assert _ids(M.read_snapshot(spark, root)) == set(range(20))
    with pytest.raises(ValidationError, match="does not exist"):
        M.read_snapshot(spark, root, 1)

    # single-writer guard: re-committing an existing version refuses
    with pytest.raises(ValidationError, match="already committed"):
        M._commit_manifest(root, 3, [], {})
