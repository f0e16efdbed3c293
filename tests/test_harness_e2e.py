"""End-to-end harness run on real testdata (sf0.001): every strategy
through the full reference lifecycle — validate → selectivity → search →
oracle → recall → JSONL stats rows (§3.1)."""

import json

import pytest

from hybrid_vector_search_spark.plans.canonical import (
    CANONICAL_QUERIES,
    CanonicalQuery,
)
from hybrid_vector_search_spark.plans.harness import (
    STATS_FIELDS,
    run_queries,
    summarize,
)
from hybrid_vector_search_spark.sources.loaders import load_corpus

SF_DIR = "/root/testdata/sf0.001"
# qids 4, 5 (medium) + 7 (broad) — all non-empty at sf0.001. qid 6 matches
# zero rows at this scale: recall is then 0/K by quirk Q6 (tested below).
QUERIES3 = (
    CANONICAL_QUERIES[3],
    CANONICAL_QUERIES[4],
    CANONICAL_QUERIES[6],
)
# r11: qid 6 used to be the accidental empty-universe case ("lorem" is
# absent from the testdata vocabulary); it is a real medium-selectivity
# query now, so the quirk-Q6 contract gets a purpose-built empty filter
EMPTY_UNIVERSE_QUERY = CanonicalQuery(
    96, 106, {"lang": {"eq": "xx"}}, 10, "strict"
)


@pytest.fixture(scope="module")
def corpus(spark):
    return load_corpus(spark, SF_DIR).cache()


def test_exact_and_prefilter_recall_one(corpus, tmp_path):
    out = str(tmp_path / "results.jsonl")
    for backend in ("exact", "pre_filter"):
        rows = run_queries(
            corpus, backend, queries=QUERIES3, out_path=out
        )
        assert len(rows) == 3
        for r in rows:
            assert tuple(r.keys()) == STATS_FIELDS
            assert r["recall_at_k"] == 1.0
            assert 0.0 <= r["filter_selectivity"] <= 1.0
            assert r["method"] == backend
    # JSONL sink: 6 parseable lines in append order
    lines = [json.loads(ln) for ln in open(out)]
    assert len(lines) == 6
    assert {ln["method"] for ln in lines} == {"exact", "pre_filter"}


def test_empty_universe_quirk_q6(corpus):
    """A filter matching zero rows: empty result, selectivity 0, and recall
    0/K — the reference's graded metric divides by K regardless (quirk Q6)."""
    rows = run_queries(corpus, "exact", queries=[EMPTY_UNIVERSE_QUERY])
    (r,) = rows
    assert r["filter_selectivity"] == 0.0
    assert r["scored_vectors"] == 0
    assert r["recall_at_k"] == 0.0


def test_random_floor(corpus):
    rows = run_queries(corpus, "random", queries=QUERIES3)
    for r in rows:
        assert r["recall_at_k"] <= 0.5  # recall floor, not a real strategy
        assert r["scored_vectors"] == 0


def test_post_filter_full_probe_high_recall(corpus):
    rows = run_queries(
        corpus,
        "post_filter",
        queries=QUERIES3,
        backend_kwargs={"nlist": 8, "nprobe": 8, "k_ladder": (200, 500, 1000)},
    )
    for r in rows:
        # full probe + ladder ≥ N ⇒ every allowed candidate reachable
        assert r["recall_at_k"] == 1.0
        assert r["lists_probed"] == 8
        assert r["scored_vectors"] in (200, 500, 1000)


def test_summarize_shape(corpus):
    rows = run_queries(corpus, "exact", queries=QUERIES3)
    s = summarize(rows)
    assert set(s) == {"exact"}
    assert s["exact"]["n"] == 3 and s["exact"]["mean_recall_at_k"] == 1.0
