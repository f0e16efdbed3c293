"""GDPR erasure cascade (sources/purge.py): derived-root registry,
per-root purge commits, forensic residual scan, history truncation.
The randomized interleavings live in test_manifest.py (model soak's
purge actor + the quarantine/purge soak); the end-to-end five-artifact
cascade is oracle-gated by the corpus_purge_cascade registry query."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.errors import ValidationError
from hybrid_vector_search_spark.sources import manifest as M
from hybrid_vector_search_spark.sources import purge as PU


def _events(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 5, i * 10) for i in range(lo, hi)],
        "id long, user long, value long",
    )


def test_registry_enumeration_cascade(spark, tmp_path):
    base = str(tmp_path)
    main = os.path.join(base, "main")
    idx = os.path.join(base, "idx")
    M.commit_append(main, _events(spark, 0, 40))
    M.commit_append(main, _events(spark, 40, 60))
    # a derived root whose owner is an EXPRESSION over its own key
    M.commit_append_clustered(
        idx,
        _events(spark, 0, 60).select(
            (F.col("id") % 4).cast("int").alias("ck"), "id", "user"
        ),
        "ck",
    )
    PU.register_derived_root(base, "main", main, "user")
    PU.register_derived_root(
        base, "idx", idx, "user", cluster_column="ck"
    )
    # idempotent by name: re-registration updates, never duplicates
    PU.register_derived_root(
        base, "idx", idx, "user", cluster_column="ck"
    )
    with open(os.path.join(base, "derived_roots.json")) as f:
        assert sorted(json.load(f)) == ["idx", "main"]

    audit = {
        r["artifact"]: r.asDict()
        for r in PU.purge_user_cascade(spark, base, 3).collect()
    }
    subject_rows = len([i for i in range(60) if i % 5 == 3])
    for name, total in (("main", 60), ("idx", 60)):
        a = audit[name]
        assert a["rows_before"] == total
        assert a["purged_rows"] == subject_rows
        assert a["rows_after"] == total - subject_rows
        assert a["residual_rows_any_file"] == 0
        assert a["retained_versions"] == 1
    # forensic double-check outside the cascade's own scan: no raw file
    # under either root holds a subject row, and no superseded manifest
    # can reach one (history truncated)
    for root in (main, idx):
        files = glob.glob(
            os.path.join(root, "data", "**", "*.parquet"), recursive=True
        )
        assert files
        raw = spark.read.parquet(*files)
        assert raw.filter(F.col("user") == 3).count() == 0
        assert len(M.list_versions(root)) == 1
    # the clustered root kept its layout: every file min==max on ck
    cur = M._resolve_manifest(idx, M.current_version(idx))
    for rel in cur["files"]:
        mm = cur["stats"][rel]["ck"]
        assert mm[0] == mm[1], (rel, mm)


def test_unregistered_base_refuses(spark, tmp_path):
    with pytest.raises(ValidationError, match="registry"):
        PU.purge_user_cascade(spark, str(tmp_path / "nowhere"), 1)


def test_null_owner_rows_are_bystanders(spark, tmp_path):
    """NULL subject linkage must be KEPT: erasure never removes rows it
    cannot attribute (the coalesce in _subject_pred)."""
    root = str(tmp_path / "tbl")
    M.commit_append(
        root,
        spark.createDataFrame(
            [(1, 3), (2, None), (3, 4)], "id long, user long"
        ),
    )
    a = PU.purge_subject(
        spark,
        PU.PurgeTarget(
            "tbl", root, subject_col="user", subject_values=(3,)
        ),
    )
    assert a["purged_rows"] == 1
    got = {r["id"] for r in M.read_snapshot(spark, root).collect()}
    assert got == {2, 3}


def test_resident_tier_invalidated_on_purge(spark, tmp_path):
    """RAM is a storage tier: a serving tier built over a root before
    its purge still holds the subject's rows resident — the purge must
    fire the tier's registered invalidator (scoped to the root), and
    must NOT fire invalidators scoped elsewhere."""
    root = str(tmp_path / "tbl")
    other = str(tmp_path / "other")
    M.commit_append(root, _events(spark, 0, 20))
    fired: list[str] = []
    PU.register_resident_invalidator(root, lambda: fired.append("hit"))
    PU.register_resident_invalidator(other, lambda: fired.append("miss"))
    PU.purge_subject(
        spark,
        PU.PurgeTarget(
            "tbl", root, subject_col="user", subject_values=(2,)
        ),
    )
    assert fired == ["hit"]


def test_dedup_ingest_registers_for_erasure(spark, tmp_path):
    """The production dedup-ingest kernel registers its posting +
    survivor roots at build time, so a later purge_user_cascade can
    enumerate and erase a document from the streaming index without a
    runbook remembering it exists."""
    from hybrid_vector_search_spark.operators.dedup import (
        dedup_ingest_commit_batch,
    )

    base = str(tmp_path)
    docs = spark.createDataFrame(
        [(i, f"unique document text number {i} with words {i * 7}")
         for i in range(8)],
        "doc_id long, text string",
    )
    dedup_ingest_commit_batch(
        spark, docs, 0,
        os.path.join(base, "index"), os.path.join(base, "survivors"),
        0.2, erasure_registry_dir=base,
    )
    audit = {
        r["artifact"]: r.asDict()
        for r in PU.purge_user_cascade(spark, base, 3).collect()
    }
    assert set(audit) == {"dedup_postings", "dedup_survivors"}
    assert audit["dedup_survivors"]["purged_rows"] == 1
    assert audit["dedup_postings"]["purged_rows"] > 0  # bands + grams
    for a in audit.values():
        assert a["residual_rows_any_file"] == 0
        assert a["retained_versions"] == 1
    # the postings index kept its probe layout: files still min==max ck
    idx = os.path.join(base, "index")
    cur = M._resolve_manifest(idx, M.current_version(idx))
    for rel in cur["files"]:
        mm = cur["stats"][rel]["ck"]
        assert mm[0] == mm[1], (rel, mm)


def test_batched_erasure_requests(spark, tmp_path):
    """N erasure requests batch into ONE pass per root — the
    amortization the 100 TB cost argument depends on."""
    base = str(tmp_path)
    root = os.path.join(base, "tbl")
    M.commit_append(root, _events(spark, 0, 50))
    PU.register_derived_root(base, "tbl", root, "user")
    a = {
        r["artifact"]: r.asDict()
        for r in PU.purge_user_cascade(spark, base, [1, 3]).collect()
    }["tbl"]
    gone = len([i for i in range(50) if i % 5 in (1, 3)])
    assert a["purged_rows"] == gone
    assert a["retained_versions"] == 1  # ONE commit for the whole batch
    left = {r["user"] for r in M.read_snapshot(spark, root).collect()}
    assert left == {0, 2, 4}


def test_targeted_purge_drops_wholly_owned_cluster(spark, tmp_path):
    """A cluster file containing ONLY the subject's rows has no
    replacement content: the targeted commit must drop it outright
    (provably covered), never write an empty file or straddle-error."""
    root = str(tmp_path / "tbl")
    rows = [(i, i % 4, 7 if i % 4 == 2 else i % 3) for i in range(40)]
    # cluster 2 is wholly owned by user 7; user 7 appears nowhere else
    M.commit_append_clustered(
        root,
        spark.createDataFrame(rows, "id long, ck long, user long"),
        "ck",
    )
    pre = set(M._resolve_manifest(root, M.current_version(root))["files"])
    a = PU.purge_subject(
        spark,
        PU.PurgeTarget(
            "tbl", root, subject_col="user", subject_values=(7,),
            cluster_column="ck", targeted=True,
        ),
    )
    assert a["purged_rows"] == 10
    assert a["residual_rows_any_file"] == 0
    post = set(M._resolve_manifest(root, M.current_version(root))["files"])
    assert len(post) == 3  # the wholly-owned cluster file is GONE
    assert len(pre & post) == 3  # and the other three carried untouched
    got = {r["ck"] for r in M.read_snapshot(spark, root).collect()}
    assert got == {0, 1, 3}


def test_delete_masked_subject_rows_physically_erased(spark, tmp_path):
    """A subject already LOGICALLY removed by an equality-delete file
    has purged_rows == 0 in the deletes-applied snapshot — but its
    physical bytes still sit in the data files the delete entry masks,
    and vacuum alone never destroys them. The purge must detect the
    live delete entries and force a rewriting commit anyway (r14
    advice, medium)."""
    root = str(tmp_path / "tbl")
    M.commit_append(root, _events(spark, 0, 30))
    # logical removal of the subject (user 2): zero data files move
    M.commit_delete_where(
        root,
        spark.createDataFrame(
            [(i,) for i in range(30) if i % 5 == 2], "id long"
        ),
        "id",
    )
    assert M.snapshot_delete_files(root)  # live delete entries
    a = PU.purge_subject(
        spark,
        PU.PurgeTarget(
            "tbl", root, subject_col="user", subject_values=(2,)
        ),
    )
    assert a["purged_rows"] == 0  # logical snapshot had none left
    assert a["residual_rows_any_file"] == 0  # but the BYTES are gone
    assert a["retained_versions"] == 1
    files = glob.glob(
        os.path.join(root, "data", "**", "*.parquet"), recursive=True
    )
    assert files
    raw = spark.read.parquet(*files)
    assert raw.filter(F.col("user") == 2).count() == 0
    assert not M.snapshot_delete_files(root)  # entries pruned too


def test_targeted_purge_full_rewrite_under_live_deletes(spark, tmp_path):
    """The targeted carry-files path is UNSAFE while live delete
    entries exist: a carried cluster file can hold delete-masked
    subject rows outside the touched set. The purge must fall back to
    the full clustered rewrite (r14 advice, medium)."""
    root = str(tmp_path / "tbl")
    rows = [(i, i % 4, i % 5) for i in range(40)]
    M.commit_append_clustered(
        root,
        spark.createDataFrame(rows, "id long, ck long, user long"),
        "ck",
    )
    # logically delete ONE subject row (subject = user 3 → ids 3,8,13…;
    # id 3 lives in cluster 3) so its bytes are delete-masked, not gone
    M.commit_delete_where(
        root, spark.createDataFrame([(3,)], "id long"), "id"
    )
    pre = set(M._resolve_manifest(root, M.current_version(root))["files"])
    a = PU.purge_subject(
        spark,
        PU.PurgeTarget(
            "tbl", root, subject_col="user", subject_values=(3,),
            cluster_column="ck", targeted=True,
        ),
    )
    assert a["residual_rows_any_file"] == 0
    post = set(M._resolve_manifest(root, M.current_version(root))["files"])
    assert not (pre & post)  # full rewrite: NO file carried
    files = glob.glob(
        os.path.join(root, "data", "**", "*.parquet"), recursive=True
    )
    raw = spark.read.parquet(*files)
    assert raw.filter(F.col("user") == 3).count() == 0
    # layout preserved: still one-cluster-per-file
    cur = M._resolve_manifest(root, M.current_version(root))
    for rel in cur["files"]:
        mm = cur["stats"][rel]["ck"]
        assert mm[0] == mm[1], (rel, mm)


def test_pinned_refs_dropped_on_purge(spark, tmp_path):
    """A tag or branch pinning an older version preserves a time-travel
    path to the purged bytes through vacuum(keep_last=1). Purge
    truncates history by contract, so pinning refs are dropped first
    (default) — and the audit pins retained_versions == 1."""
    root = str(tmp_path / "tbl")
    M.commit_append(root, _events(spark, 0, 20))
    M.create_tag(root, "model-v1")
    M.create_branch(root, "wip")
    M.commit_append(root, _events(spark, 20, 40))
    a = PU.purge_subject(
        spark,
        PU.PurgeTarget(
            "tbl", root, subject_col="user", subject_values=(1,)
        ),
    )
    assert a["retained_versions"] == 1
    assert a["residual_rows_any_file"] == 0
    assert M.list_tags(root) == {}
    assert M.list_branches(root) == {}


def test_purge_refuses_on_pinned_refs_when_not_dropping(spark, tmp_path):
    """drop_pinned_refs=False is the REFUSE mode: with strict on
    (default), a purge that would leave a time-travel path raises
    PurgeContractError instead of returning a normal audit row."""
    root = str(tmp_path / "tbl")
    M.commit_append(root, _events(spark, 0, 20))
    M.create_tag(root, "pinned")
    M.commit_append(root, _events(spark, 20, 40))
    with pytest.raises(PU.PurgeContractError, match="retained_versions"):
        PU.purge_subject(
            spark,
            PU.PurgeTarget(
                "tbl", root, subject_col="user", subject_values=(1,)
            ),
            drop_pinned_refs=False,
        )


def test_cascade_invalidates_source_scoped_residents(spark, tmp_path):
    """A serve tier built over the SOURCE corpus registers its
    invalidator against the corpus directory — which no per-root purge
    ever matches. The cascade must fire invalidators for every
    registered root's recorded ``source`` so the purge reaches that RAM
    too (r14 advice: the sf_dir-scoped invalidators were inert)."""
    base = str(tmp_path / "base")
    src = str(tmp_path / "corpus_dir")
    os.makedirs(src)
    root = os.path.join(base, "idx")
    M.commit_append(root, _events(spark, 0, 20))
    PU.register_derived_root(base, "idx", root, "user", source=src)
    fired: list[str] = []
    PU.register_resident_invalidator(src, lambda: fired.append("src"))
    PU.purge_user_cascade(spark, base, 2)
    assert "src" in fired


def test_register_derived_root_concurrent_writers(spark, tmp_path):
    """Two concurrent builders must not lose a registration — the
    read-modify-write is lock-serialized (r14 advice)."""
    import threading

    base = str(tmp_path)

    def reg(i: int) -> None:
        PU.register_derived_root(
            base, f"root{i}", os.path.join(base, f"r{i}"), "user"
        )

    threads = [threading.Thread(target=reg, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    with open(os.path.join(base, "derived_roots.json")) as f:
        assert sorted(json.load(f)) == sorted(
            f"root{i}" for i in range(16)
        )
    assert not os.path.exists(
        os.path.join(base, "derived_roots.json.lock")
    )


def test_audit_purge_registry_detects_unregistered_roots(spark, tmp_path):
    """The completeness audit walks the NAMESPACE (ground truth), not
    the registry: a purged registered root reports 0, a forgotten
    unregistered root still holding the subject fires with the exact
    count, and a root no owner probe can attribute reports -1."""
    base = str(tmp_path)
    reg_root = os.path.join(base, "registered")
    forgot = os.path.join(base, "forgotten")
    anon = os.path.join(base, "anon")
    M.commit_append(reg_root, _events(spark, 0, 40))
    M.commit_append(forgot, _events(spark, 0, 40))
    M.commit_append(
        anon,
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long"),
    )
    PU.register_derived_root(base, "registered", reg_root, "user")
    PU.purge_user_cascade(spark, base, 3)
    audit = {
        r["artifact"]: r.asDict()
        for r in PU.audit_purge_registry(
            spark, base, 3, ["user", "doc_id % 50"]
        ).collect()
    }
    assert set(audit) == {"registered", "forgotten", "anon"}
    assert audit["registered"]["registered"] is True
    assert audit["registered"]["subject_rows"] == 0
    assert audit["forgotten"]["registered"] is False
    assert audit["forgotten"]["subject_rows"] == len(
        [i for i in range(40) if i % 5 == 3]
    )
    assert audit["anon"]["registered"] is False
    assert audit["anon"]["subject_rows"] == -1  # unattributable
