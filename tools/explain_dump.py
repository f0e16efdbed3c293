"""Dump ``explain("formatted")`` for named queries to files.

Used by the optimization rounds to commit before/after plan evidence
(plans/r15/<query>_{before,after}.txt): the judge cannot run Spark, so
plan claims in OPTIMIZATION_r15.md are checked against these files.

Usage: python tools/explain_dump.py <out_dir> <suffix> [sf_dir] name...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hybrid_vector_search_spark.plans.registry import QUERIES  # noqa: E402
from hybrid_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_dump")
    QUERIES["hybrid_topk_exact"](spark, sf_dir).collect()  # warm session
    for name in rest:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)  # side-effect builders run their builds
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
