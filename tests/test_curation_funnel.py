"""docs_curation_funnel stage-by-stage: synthetic corpus where every
gate provably drops at least one crafted document, so the funnel's
retention arithmetic is pinned against hand-counted expectations (the
sf testdata has no exact duplicates, so the dedup stage would otherwise
never be seen to bite)."""

import pytest

from hybrid_vector_search_spark.plans import registry as R


def para(prefix: str, n: int = 30) -> str:
    """Long 'en' paragraph with a per-prefix vocabulary: en marker words
    interleaved with unique tokens, so two paragraphs with different
    prefixes never share a 4-consecutive-word gram (every other word
    differs)."""
    markers = ("the", "and", "of", "is", "to", "a")
    words = []
    for i in range(n):
        words.append(markers[i % 6])
        words.append(f"{prefix}{i}")
    return " ".join(words)


@pytest.fixture(scope="module")
def funnel_dir(spark, tmp_path_factory):
    rows = []

    def doc(i, text):
        rows.append((i, text, "en", "src1", len(text)))

    # doc 0: benchmark slice (0 % 11 == 0) — excluded at decontamination;
    # carries the 4-gram 'peace zebra quartz window' doc 4 will share
    doc(0, para("benchword") + " peace zebra quartz window")
    # doc 1: no language markers → lang 'und', dropped at stage 1
    doc(1, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii " * 4)
    # doc 2: en markers but punctuation-saturated → quality 0, stage 2
    doc(2, "the and of is to a " + "!!! ??? ,,, ;;; " * 20)
    # docs 3 & 14: exact duplicates — 14 dropped at stage 3 (keep-first)
    doc(3, para("goodword"))
    doc(14, para("goodword"))
    # doc 4: own vocabulary but shares the bench 4-gram → stage 4
    doc(4, para("otherword") + " peace zebra quartz window")
    # docs 5..8: clean survivors into the split stage
    for i in (5, 6, 7, 8):
        doc(i, para(f"w{i}x"))

    d = tmp_path_factory.mktemp("funnel_sf")
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_every_stage_bites(spark, funnel_dir):
    out = {
        r.stage: r
        for r in R.QUERIES["docs_curation_funnel"](spark, funnel_dir).collect()
    }
    n = {k: v.n_docs for k, v in out.items()}
    assert n["0_total"] == 10
    assert n["1_lang_en"] == 9  # doc 1 (und) dropped
    assert n["2_quality"] == 8  # doc 2 (punctuation) dropped
    assert n["3_exact_dedup"] == 7  # doc 14 (dup of 3) dropped
    # stage 4 drops bench doc 0 AND contaminated doc 4
    assert n["4_decontaminated"] == 5
    # split keeps a deterministic hash subset of the 5
    assert 0 <= n["5_train_split"] <= 5
    assert out["0_total"].pct_of_total == 1.0
    assert out["4_decontaminated"].pct_of_total == pytest.approx(
        0.5, abs=1e-9
    )


def test_funnel_is_deterministic_across_fresh_plans(spark, funnel_dir):
    fn = R.QUERIES["docs_curation_funnel"]
    a = [tuple(r) for r in fn(spark, funnel_dir).collect()]
    # bypass the prepared-plan memo: rebuild the plan from scratch
    b = [tuple(r) for r in fn.__wrapped__(spark, funnel_dir).collect()]
    assert a == b
