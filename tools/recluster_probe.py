"""Scale shape of the index-staleness maintenance loop (r15).

Two costs matter at 100 TB and they scale differently — the probe pins
both on synthetic corpora at x1 / x4 / x16:

* MEASURE (every monitoring tick): coverage counts + the
  assignment-histogram PSI (operators/ivf.assignment_drift_psi). Wall
  tracks one grouped aggregate per version; driver state is 2 x nlist
  rows regardless of corpus size.
* REBUILD (only when triggered): one clustered rewrite of the
  assignment table — honestly O(corpus); the loop's point is that this
  cost is paid exactly when the measured staleness says so, not per
  tick.

Usage: python tools/recluster_probe.py [base_n] [d]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from hybrid_vector_search_spark.operators.ivf import (  # noqa: E402
    assign_list_udf,
    assignment_drift_psi,
)
from hybrid_vector_search_spark.session import get_spark  # noqa: E402
from hybrid_vector_search_spark.sources import manifest as M  # noqa: E402

BASE_N = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 64
NLIST = 16


def corpus(spark, n: int):
    def gen(it):
        import pandas as pd

        for pdf in it:
            for pid in pdf["id"].tolist():
                rng = np.random.default_rng(pid)
                size = n // 32 + (1 if pid < n % 32 else 0)
                base = pid * (n // 32) + min(pid, n % 32)
                v = rng.standard_normal((size, D))
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {
                        "id": np.arange(base, base + size, dtype=np.int64),
                        "embedding": list(v.astype(np.float64)),
                    }
                )

    return (
        spark.range(32)
        .select(F.col("id").cast("long"))
        .mapInPandas(gen, "id long, embedding array<double>")
    )


def main() -> None:
    spark = get_spark()
    out = []
    for mult in (1, 4, 16):
        n = BASE_N * mult
        full = corpus(spark, n).persist()
        full.count()
        v1 = full.filter(F.col("id") % 5 != 0)
        cents = np.vstack(
            [
                np.asarray(r["embedding"], dtype=np.float64)
                for r in v1.orderBy("id").limit(NLIST).collect()
            ]
        )
        t0 = time.perf_counter()
        t1, t2 = v1.count(), full.count()
        psi = assignment_drift_psi(v1, full, cents)
        measure_s = time.perf_counter() - t0
        root = str(
            Path(REPO) / "spark-warehouse" / f"recl_probe_{n}"
        )
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        t0 = time.perf_counter()
        M.commit_append_clustered(
            root,
            full.withColumn(
                "list_id", assign_list_udf(cents)(F.col("embedding"))
            ),
            "list_id",
        )
        rebuild_s = time.perf_counter() - t0
        shutil.rmtree(root, ignore_errors=True)
        full.unpersist()
        out.append(
            {
                "mult": mult,
                "rows": n,
                "stale_frac": round((t2 - t1) / t2, 4),
                "psi": round(psi, 6),
                "measure_s": round(measure_s, 2),
                "rebuild_s": round(rebuild_s, 2),
            }
        )
        print(json.dumps(out[-1]))


if __name__ == "__main__":
    main()
