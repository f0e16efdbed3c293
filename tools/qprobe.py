"""Per-query optimization probe (r15): wall time AND Spark job count.

For each named query, runs N passes the same way bench.py does (toPandas
terminal action, side-effect builders re-run per pass) and reports, per
pass: wall seconds and how many Spark jobs the pass launched (from the
driver's AppStatusStore). Job count × job floor (~60 ms on this host) is
the lower bound a multi-job query can ever reach — the first thing to
know before optimizing one (guide §1: measure first; §7.2 plan reading
tells you *what* each job is).

Usage: python tools/qprobe.py [sf_dir] name [name ...]
       python tools/qprobe.py [sf_dir] --top N   (N slowest from BENCH_DETAIL)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hybrid_vector_search_spark.plans.registry import QUERIES  # noqa: E402
from hybrid_vector_search_spark.session import get_spark  # noqa: E402


def n_jobs(spark) -> int:
    """Total jobs submitted so far in this app (AppStatusStore)."""
    store = spark._jsc.sc().statusStore()
    return store.jobsList(None).size()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    if args and args[0] == "--top":
        n = int(args[1])
        detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
        names = [
            k
            for k, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ]
    else:
        names = args
    passes = int(os.environ.get("QPROBE_PASSES", "2"))

    spark = get_spark("qprobe")
    # warm the session the way bench does (first query pays JVM+codegen)
    QUERIES["hybrid_topk_exact"](spark, sf_dir).collect()

    print(f"{'query':42s} {'pass':>4s} {'wall_s':>8s} {'jobs':>5s}")
    results = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND", file=sys.stderr)
            continue
        walls, jobs = [], []
        for p in range(passes):
            spark.sparkContext.setJobDescription(f"qprobe:{name}:{p}")
            j0 = n_jobs(spark)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            try:
                df.toPandas()
            except Exception:
                df.collect()
            w = time.perf_counter() - t0
            j = n_jobs(spark) - j0
            walls.append(w)
            jobs.append(j)
            print(f"{name:42s} {p:4d} {w:8.3f} {j:5d}")
        results[name] = {"best_s": round(min(walls), 4), "jobs": jobs}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
