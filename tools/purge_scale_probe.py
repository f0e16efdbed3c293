"""Measure the purge cascade's cost shape as the derived table grows.

The claim that makes erasure viable at 100 TB: on a CLUSTERED derived
root whose subject provably lives in a bounded set of clusters (the
IVF-list layout), the purge's targeted ``commit_replace_values`` commit
rewrites ONLY the touched cluster files and carries every disjoint file
as untouched bytes — so purge cost tracks the subject's clusters, not
the table. On scatter layouts (BM25/dedup postings) the honest cost is
one clustered rewrite, growing with the table. This probe measures both
on the same data at ×1/×4/×16 the sf0.01 embeddings.

Usage: python tools/purge_scale_probe.py   (prints one JSON line per ×K)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hybrid_vector_search_spark.scratch import scratch_path  # noqa: E402
from hybrid_vector_search_spark.session import get_spark  # noqa: E402
from hybrid_vector_search_spark.sources import manifest as M  # noqa: E402
from hybrid_vector_search_spark.sources import purge as PU  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
NLIST = 64


def _assigned(spark, mult: int):
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.ivf import assign_list_udf

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    base_n = emb.count()
    parts = [
        emb.select(
            (F.col("vec_id") + k * base_n).alias("vec_id"), "embedding"
        )
        for k in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    cents = np.vstack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.orderBy("vec_id").limit(NLIST).collect()
        ]
    )
    return out.withColumn(
        "list_id", assign_list_udf(cents)(F.col("embedding"))
    )


def main() -> None:
    spark = get_spark()
    subject = 7  # one vector: its lists are the touched set
    for mult in (1, 4, 16):
        asg = _assigned(spark, mult).persist()
        asg.count()
        row = {"mult": mult, "rows": asg.count()}
        for mode in ("targeted", "full_rewrite"):
            root = scratch_path(f"purge_probe_{mult}_{mode}")
            M.commit_append_clustered(root, asg, "list_id")
            pre = set(
                M._resolve_manifest(root, M.current_version(root))["files"]
            )
            t0 = time.perf_counter()
            audit = PU.purge_subject(
                spark,
                PU.PurgeTarget(
                    mode, root,
                    subject_col="vec_id", subject_values=(subject,),
                    cluster_column="list_id",
                    targeted=(mode == "targeted"),
                ),
            )
            wall = time.perf_counter() - t0
            post = set(
                M._resolve_manifest(root, M.current_version(root))["files"]
            )
            row[f"{mode}_sec"] = round(wall, 2)
            row[f"{mode}_files_carried"] = len(pre & post)
            row[f"{mode}_files_rewritten"] = len(post - pre)
            assert audit["purged_rows"] == 1, audit
            assert audit["residual_rows_any_file"] == 0, audit
        asg.unpersist()
        print(json.dumps(row))


if __name__ == "__main__":
    main()
