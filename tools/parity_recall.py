"""Reproduce the reference's HEADLINE recall trade-off at its own shape.

BASELINE.md's central result is not a latency number — it is the
filtered-ANN tension: pre_filter holds ~0.99 mean recall@10 with latency
proportional to selectivity, while post_filter's recall is BIMODAL
(≈1.0 on broad filters, collapsing toward 0.0 on strict ones, mean
0.73) because the IVF candidate ladder exhausts before K survivors pass
a strict predicate. r9 verdict #5: the repo demonstrated this only on
synthetic sweep curves, not at the parity shape as a committed
artifact.

This probe runs the 10 canonical queries at the derived 150,346×384
corpus (tools/parity_probe.py build_parity_corpus) through all four
reference strategies — exact / pre_filter / post_filter / random — via
the engine's own evaluation harness (plans/harness.py run_queries: the
reference's 14-field stats contract, recall against the exact oracle
over the same filtered universe), and commits the rows as
``fixtures/parity_results.jsonl`` — the mirror of the reference's
``results/results.jsonl``. tools/parity_probe.py folds the recall
table into BASELINE_PARITY.md from this file.

Latency caveat: rows carry wall latency of a COLD single run each (the
harness contract), so they are not min-of-N comparable with the parity
latency tables — recall, selectivity, and scored_vectors are the
payload here.

Usage: python tools/parity_recall.py   (writes fixtures/parity_results.jsonl)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hybrid_vector_search_spark.session import get_spark  # noqa: E402

OUT = REPO / "fixtures" / "parity_results.jsonl"
BACKENDS = ("exact", "pre_filter", "post_filter", "random")


def main() -> None:
    from tools.parity_probe import build_parity_corpus, parity_query_vector

    from hybrid_vector_search_spark.plans.harness import (
        run_queries,
        summarize,
    )

    spark = get_spark("parity_recall")
    corpus = build_parity_corpus(spark).cache()
    n = corpus.count()
    print(f"parity corpus resident: N={n:,}")

    if OUT.exists():
        OUT.unlink()  # append_jsonl appends; a rerun starts clean
    for backend in BACKENDS:
        rows = run_queries(
            corpus,
            backend,
            k=10,
            n=n,
            out_path=str(OUT),
            version="parity150k",
            # cluster-aligned queries (same α/β blend as the corpus):
            # a query's true neighborhood concentrates in one planted
            # cluster, which is what makes IVF recall MEASURE the
            # pre/post-filter tension instead of isotropic tie-noise
            qvec_factory=parity_query_vector,
        )
        print(backend, json.dumps(summarize(rows)))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
