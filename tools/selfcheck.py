"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given scale factor, then compares row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage: python tools/selfcheck.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hybrid_vector_search_spark.session import get_spark  # noqa: E402
from hybrid_vector_search_spark.sources.loaders import TESTDATA_TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, float):
            return round(v, 9)
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:
            return tuple(canon(x) for x in v)  # numpy arrays (DuckDB lists)
        if hasattr(v, "item"):  # numpy scalars
            return canon(v.item())
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        if isinstance(v, (pd.Timestamp,)):
            return str(v)
        return v

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), kind="mergesort", na_position="last").reset_index(
        drop=True
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # Driver rehearsal: a bare session without any get_spark defaults
        # (no UTC tz, no Arrow confs, default shuffle partitions) — the
        # environment __spark_entry__ actually runs in.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("selfcheck-plain")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("selfcheck", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if name_filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in name_filters)}

    # entry smoke
    if not name_filters:
        n = entrymod.entry(spark).count()
        print(f"entry() smoke: {n} rows")

    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt_spark = time.perf_counter() - t0
        if name not in oracles:
            print(f"pass {name}: rows-only check ({len(spark_pdf)} rows, no oracle) [{dt_spark:.1f}s]")
            n_pass += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue

        problems = []
        if len(spark_pdf) != len(oracle_pdf):
            problems.append(f"rowcount {len(spark_pdf)} vs {len(oracle_pdf)}")
        if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
            problems.append(
                f"columns {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
            )
        if not problems:
            a, b = normalize(spark_pdf), normalize(oracle_pdf)
            if not a.equals(b):
                diff_mask = ~(a.eq(b) | (a.isna() & b.isna()))
                ndiff = int(diff_mask.any(axis=1).sum())
                problems.append(f"{ndiff}/{len(a)} rows differ")
                ex = diff_mask.any(axis=1)
                idx = a.index[ex][:3]
                for i in idx:
                    problems.append(f"  spark={a.loc[i].to_dict()}")
                    problems.append(f"  duckdb={b.loc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_pdf)} rows) [{dt_spark:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
