"""Encode-wall-vs-K probe for the Arrow BPE kernel (r15 verdict task 2).

Measures the text_bpe_encode_vocab execution paths on the sf corpus:

* arrow  — mapInPandas bpe_chained_encode, merge table in the closure;
* unroll — K chained F.replace expressions (plan depth ∝ K), K ≤ 256.

K sweeps past the derivable table by PADDING with inapplicable merges
(fresh symbols that occur in no document) — the realistic regime, since
a production merge table is mostly inapplicable to any one document;
the kernel's heap admits only currently-adjacent pairs, so padded
entries cost a dict lookup at build time and nothing per row.

Usage: python tools/bpe_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from hybrid_vector_search_spark.functions.text import (  # noqa: E402
    bpe_encode_token_counts,
)
from hybrid_vector_search_spark.plans.registry_corpus import (  # noqa: E402
    _bpev_merges,
    _bpev_norm_col,
)
from hybrid_vector_search_spark.session import get_spark  # noqa: E402
from hybrid_vector_search_spark.sources.loaders import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    merges = _bpev_merges(spark, sf_dir)
    print(f"derivable merges: {len(merges)}")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.concat(F.lit(" "), _bpev_norm_col(), F.lit(" ")).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    print(f"encode set: {n_docs} docs (whole table)")

    def padded(k: int) -> list[tuple]:
        if k <= len(merges):
            return merges[:k]
        pad = [(f"\x01{i}", "\x01") for i in range(k - len(merges))]
        return merges + pad

    for k in (64, 256, 1024, 4096, 32768):
        table = padded(k)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            got = (
                docs.mapInPandas(
                    bpe_encode_token_counts(table, text_col="s"),
                    "doc_id long, n_tok int",
                )
                .agg(F.sum("n_tok"))
                .first()[0]
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"arrow  K={k:>6}: {best*1000:8.1f} ms  tokens={got}")
        if k <= 256:
            s = F.col("s")
            for lhs, rhs in table:
                s = F.replace(
                    s, F.lit(f" {lhs} {rhs} "), F.lit(f" {lhs}_{rhs} ")
                )
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                got_u = (
                    docs.select(
                        F.size(F.split(F.trim(s), " ")).alias("n")
                    )
                    .agg(F.sum("n"))
                    .first()[0]
                )
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            tag = "==" if got_u == got else "!= MISMATCH"
            print(
                f"unroll K={k:>6}: {best*1000:8.1f} ms  tokens={got_u} {tag}"
            )


if __name__ == "__main__":
    main()
