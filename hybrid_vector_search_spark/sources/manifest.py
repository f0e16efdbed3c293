"""Versioned-manifest table layout — snapshot isolation and time travel
on plain parquet, the single-writer core of what table formats
(Iceberg/Delta/Hudi) provide.

Every maintenance path in this engine (IVF upsert, BM25 append, rollup
merge, drain-and-swap) already closes its CRASH window with a
begin/commit marker — but plain directory layouts still leave two
reader-side gaps a 100-TB deployment cares about:

* **no read isolation**: a reader listing a directory mid-commit can see
  a half-applied state (dynamic partition overwrite is not atomic
  across partitions), and the rename-swap layouts have an instant where
  the root directory does not exist;
* **no time travel**: yesterday's table is gone the moment today's
  commit lands — no reproducible reads for a training run pinned to a
  snapshot.

The manifest layout closes both with two invariants:

1. **data files are immutable** — writers only ADD files under
   ``data/<uuid>/``, never modify or delete live ones (vacuum removes
   only files referenced by NO retained version);
2. **a version is a manifest** — ``manifest-<v>.json`` lists the data
   files of snapshot ``v`` in full. Committing = writing the manifest to
   a temp name and ``os.rename``-ing it into place (atomic on POSIX);
   reading = pick a manifest (latest by default, any retained version
   for time travel) and scan exactly its files.

A reader therefore ALWAYS sees a complete committed snapshot: a crash
mid-commit leaves data files without a manifest (invisible, re-written
by the retried commit), and a reader racing a commit sees either v or
v+1, never a mix. Single-writer by design — multi-writer needs a
compare-and-swap on the manifest name, which object stores offer as
conditional PUT; that (plus column stats in the manifest for file
skipping) is exactly the road to a real table format, noted in
SURVEY-style honesty rather than half-implemented.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from hybrid_vector_search_spark.errors import ValidationError

_MANIFEST_PREFIX = "manifest-"


def _manifest_name(version: int) -> str:
    return f"{_MANIFEST_PREFIX}{version:010d}.json"


def list_versions(root: str) -> list[int]:
    """Retained snapshot versions, ascending (empty for a fresh root)."""
    if not os.path.isdir(root):
        return []
    out = []
    for f in os.listdir(root):
        if f.startswith(_MANIFEST_PREFIX) and f.endswith(".json"):
            try:
                out.append(int(f[len(_MANIFEST_PREFIX):-5]))
            except ValueError:
                continue
    return sorted(out)


def current_version(root: str) -> int:
    """Latest committed version, -1 when the table has none."""
    vs = list_versions(root)
    return vs[-1] if vs else -1


def _read_manifest(root: str, version: int) -> dict:
    p = os.path.join(root, _manifest_name(version))
    if not os.path.exists(p):
        raise ValidationError(
            f"snapshot version {version} does not exist at '{root}' "
            f"(retained: {list_versions(root)})"
        )
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def snapshot_files(root: str, version: int | None = None) -> tuple[int, list[str]]:
    """(version, absolute data-file paths) of a snapshot — latest when
    ``version`` is None."""
    v = current_version(root) if version is None else int(version)
    if v < 0:
        raise ValidationError(f"no committed snapshot at '{root}'")
    m = _read_manifest(root, v)
    return v, [os.path.join(root, rel) for rel in m["files"]]


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Scan exactly one committed snapshot's files. The file list is
    pinned at plan time, so the resulting DataFrame is a REPRODUCIBLE
    read: later commits (which only add files and manifests) cannot
    change what this plan scans — the property a training run pins a
    data snapshot with."""
    _v, files = snapshot_files(root, version)
    return spark.read.parquet(*files)


def _write_data_files(df: DataFrame, root: str, n_files: int) -> list[str]:
    """Write a batch as immutable data files under ``data/<uuid>/`` and
    return their root-relative paths."""
    sub = os.path.join("data", uuid.uuid4().hex[:12])
    out_dir = os.path.join(root, sub)
    df.repartition(max(int(n_files), 1)).write.mode("errorifexists").parquet(
        out_dir
    )
    return sorted(
        os.path.join(sub, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )


def _commit_manifest(root: str, version: int, files: list[str], meta: dict) -> None:
    """Atomic publish: temp write + rename. A crash before the rename
    leaves orphaned (invisible) data files only; a reader can never
    observe a partial manifest."""
    final = os.path.join(root, _manifest_name(version))
    if os.path.exists(final):
        raise ValidationError(
            f"version {version} already committed at '{root}' — "
            f"single-writer contract violated (concurrent committer?)"
        )
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"version": version, "files": files, **meta}, f)
    os.rename(tmp, final)


def commit_append(
    root: str,
    df: DataFrame,
    n_files: int = 1,
    meta: dict | None = None,
) -> int:
    """Append a batch as snapshot v+1 = v's files + the batch's new
    files. Returns the committed version. Cost is O(batch) — no
    existing bytes move, and every prior version stays readable.
    ``meta`` rides in the manifest itself (e.g. a streaming writer's
    micro-batch id — committed ATOMICALLY with the version, which is
    what makes :func:`last_committed_meta`-guarded foreachBatch sinks
    exactly-once under replay)."""
    os.makedirs(root, exist_ok=True)
    v = current_version(root)
    nxt = v + 1 if v >= 0 else 1  # versions are 1-based
    prior = _read_manifest(root, v)["files"] if v >= 0 else []
    new = _write_data_files(df, root, n_files)
    _commit_manifest(
        root,
        nxt,
        prior + new,
        {"op": "append", "added": len(new), **(meta or {})},
    )
    return nxt


def last_committed_meta(root: str, key: str, default=None):
    """Read a ``meta`` field from the LATEST manifest — the replay guard
    a streaming writer checks before committing a micro-batch: the
    field and the version it describes are one atomic rename, so there
    is no state where the data landed but the watermark didn't."""
    v = current_version(root)
    if v < 0:
        return default
    return _read_manifest(root, v).get(key, default)


def commit_rewrite(root: str, df: DataFrame, n_files: int = 1) -> int:
    """Publish a full REWRITE (compaction / overwrite) as v+1: the new
    snapshot references only the rewritten files, while every retained
    older manifest still references the old ones — compaction without
    breaking time travel (what the rename-swap layouts cannot offer)."""
    if current_version(root) < 0:
        raise ValidationError(
            f"nothing to rewrite at '{root}': no committed snapshot"
        )
    v = current_version(root)
    new = _write_data_files(df, root, n_files)
    _commit_manifest(
        root, v + 1, new, {"op": "rewrite", "added": len(new)}
    )
    return v + 1


def vacuum(root: str, keep_last: int = 1) -> dict:
    """Drop all but the last ``keep_last`` versions and delete data
    files referenced by NO retained manifest (plus any orphans from
    crashed commits). The only destructive operation in the layout —
    and the reason readers of retained versions are never affected:
    retention is decided FIRST, reference counting second."""
    import shutil

    vs = list_versions(root)
    if not vs:
        return {"dropped_versions": 0, "deleted_files": 0}
    keep = set(vs[-max(int(keep_last), 1):])
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(root, v)["files"])
    dropped = 0
    for v in vs:
        if v not in keep:
            os.remove(os.path.join(root, _manifest_name(v)))
            dropped += 1
    deleted = 0
    data_root = os.path.join(root, "data")
    if os.path.isdir(data_root):
        for sub in os.listdir(data_root):
            sub_dir = os.path.join(data_root, sub)
            for f in os.listdir(sub_dir):
                rel = os.path.join("data", sub, f)
                if f.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(root, rel))
                    deleted += 1
            if not any(
                fn.endswith(".parquet") for fn in os.listdir(sub_dir)
            ):
                shutil.rmtree(sub_dir, ignore_errors=True)
    return {"dropped_versions": dropped, "deleted_files": deleted}
