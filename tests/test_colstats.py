"""Property tests for the column-statistics selectivity estimator
(functions/colstats.py) — pure driver-side arithmetic, no Spark.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_vector_search_spark.functions.colstats import (
    DEFAULT_SEL,
    _range_fraction,
    estimate_allowed,
)


def _stats(n=1000, ndv_a=10, nulls_a=0, ndv_b=50, nulls_b=100):
    return {
        "__table__": {"count": n},
        "a": {"count": n, "nulls": nulls_a, "ndv": ndv_a,
              "min": None, "max": None},
        "b": {"count": n, "nulls": nulls_b, "ndv": ndv_b,
              "min": 0, "max": 100},
    }


@given(
    n=st.integers(1, 10**9),
    ndv=st.integers(1, 10**6),
    nulls=st.integers(0, 10**6),
)
@settings(max_examples=200, deadline=None)
def test_estimate_always_in_bounds(n, ndv, nulls):
    stats = {
        "__table__": {"count": n},
        "a": {"count": n, "nulls": min(nulls, n), "ndv": ndv,
              "min": None, "max": None},
    }
    for filters in (
        None,
        {},
        {"a": {"eq": 1}},
        {"a": {"ne": 1}},
        {"a": {"in": [1, 2, 3]}},
        {"a": {"like": "x"}},
    ):
        est = estimate_allowed(stats, filters)
        assert 1 <= est <= max(n, 1)


@given(
    lo=st.integers(0, 100),
    hi=st.integers(0, 100),
)
@settings(max_examples=200, deadline=None)
def test_range_fraction_in_unit_interval(lo, hi):
    f = _range_fraction(lo, hi, 0, 100)
    assert 0.0 <= f <= 1.0
    if hi > lo:
        assert f == pytest.approx((hi - lo) / 100.0)


def test_conjuncts_never_raise_estimate():
    """Adding a conjunct can only shrink (or keep) the estimate — the
    independence product is ≤ each factor."""
    stats = _stats()
    base = {"a": {"eq": 1}}
    more = {"a": {"eq": 1}, "b": {"between": [0, 50]}}
    assert estimate_allowed(stats, more) <= estimate_allowed(stats, base)


def test_point_column_range_semantics():
    """A single-valued column (min == max): any overlapping range keeps
    everything, a disjoint range keeps nothing."""
    assert _range_fraction(None, 10, 5, 5) == 1.0
    assert _range_fraction(6, None, 5, 5) == 0.0


def test_unknown_and_geo_fallbacks():
    stats = _stats()
    # unknown column → DEFAULT_SEL
    assert estimate_allowed(stats, {"zzz": {"eq": 1}}) == int(
        1000 * DEFAULT_SEL + 0.5
    )
    # geo keys map onto latitude/longitude stats; absent → DEFAULT_SEL
    est = estimate_allowed(
        stats, {"lat_between": [0, 1], "lon_between": [0, 1]}
    )
    assert est == int(1000 * DEFAULT_SEL * DEFAULT_SEL + 0.5)


def test_histogram_beats_uniform_on_skew(spark):
    """The reason histograms exist: a heavily skewed numeric column
    defeats the min–max uniform assumption by orders of magnitude; the
    equi-width histogram estimate lands near the truth."""
    from hybrid_vector_search_spark.functions.colstats import (
        collect_column_stats,
    )

    # 950 values in [0, 10), 50 outliers spread to 1000
    rows = [(i, float(i % 10)) for i in range(950)] + [
        (1000 + i, 1000.0 * (i + 1) / 50) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    true_ge_500 = df.filter("v >= 500").count()  # 25

    flat = collect_column_stats(df, ["v"])
    hist = collect_column_stats(df, ["v"], histogram_bins=20)
    assert "histogram" not in flat["v"]
    assert len(hist["v"]["histogram"]) == 20
    assert sum(hist["v"]["histogram"]) == 1000  # every non-null binned

    est_flat = estimate_allowed(flat, {"v": {"ge": 500.0}})
    est_hist = estimate_allowed(hist, {"v": {"ge": 500.0}})
    # uniform says "half the span" ≈ 500 rows — off by 20×
    assert est_flat > 10 * true_ge_500
    # histogram lands within 2× of the truth
    assert true_ge_500 / 2 <= est_hist <= true_ge_500 * 2


def test_histogram_estimate_still_bounded(spark):
    from hybrid_vector_search_spark.functions.colstats import (
        collect_column_stats,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    st = collect_column_stats(df, ["v"], histogram_bins=8)
    for filters in (
        {"v": {"ge": -5.0}},
        {"v": {"le": 1000.0}},
        {"v": {"between": [10.0, 20.0]}},
        {"v": {"between": [200.0, 300.0]}},
    ):
        est = estimate_allowed(st, filters)
        assert 1 <= est <= 100, filters
    # full-range between keeps ~everything
    assert estimate_allowed(st, {"v": {"between": [0.0, 99.0]}}) >= 95


def test_notnull_applied_once_per_column():
    """{'ge':…, 'le':…} must estimate like the equivalent
    {'between': …} — the not-null fraction is a column property, not a
    per-operator penalty (review r8 finding #4)."""
    stats = {
        "__table__": {"count": 1000},
        "v": {"count": 1000, "nulls": 500, "ndv": 100, "min": 0, "max": 100},
    }
    two_ops = estimate_allowed(stats, {"v": {"ge": 0, "le": 100}})
    between = estimate_allowed(stats, {"v": {"between": [0, 100]}})
    assert two_ops == between == 500


def test_geo_box_uses_histogram(spark):
    """Geo ranges estimate through the histogram when one was collected
    (review r8 finding #5): a skewed point cloud defeats the uniform
    assumption."""
    from hybrid_vector_search_spark.functions.colstats import (
        collect_column_stats,
    )

    # 950 points in one "city" (lat≈10), 50 spread to lat 90
    rows = [(i, 10.0 + (i % 10) * 0.01, 5.0) for i in range(950)] + [
        (1000 + i, 90.0 * (i + 1) / 50, 5.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, latitude double, longitude double")
    st = collect_column_stats(
        df, ["latitude", "longitude"], histogram_bins=20
    )
    true_n = df.filter("latitude >= 45").count()  # 25
    est = estimate_allowed(
        st, {"lat_between": [45.0, 95.0], "lon_between": [0.0, 10.0]}
    )
    # uniform would say ~half the lat span → ~500; histogram lands close
    assert est <= 3 * true_n


def test_choose_backend_costed_decision_rule():
    """The strategy chooser (VERDICT r8 next #7): pre_filter iff the
    estimated allowed set is smaller than the probe's scan fraction
    (est·nlist < n·nprobe), with the boundary itself going to
    post_filter (strict inequality — at equal cost the ANN probe's
    pruned layout wins on bytes)."""
    from hybrid_vector_search_spark.operators.strategies import (
        choose_backend_costed,
    )

    stats = {
        "__table__": {"count": 1000},
        "label": {"count": 1000, "nulls": 0, "ndv": 10,
                  "min": 0, "max": 9},
        "lang": {"count": 1000, "nulls": 0, "ndv": 5,
                 "min": None, "max": None},
    }
    # strict eq+eq: est = 1000/50 = 20; 20·16 < 1000·4 → pre_filter
    name, est = choose_backend_costed(
        stats, {"label": {"eq": 7}, "lang": {"eq": "zh"}}, 4, 16
    )
    assert (name, est) == ("pre_filter", 20)
    # broad ne: est = 800; 800·16 ≥ 4000 → post_filter
    name, est = choose_backend_costed(stats, {"lang": {"ne": "zh"}}, 4, 16)
    assert (name, est) == ("post_filter", 800)
    # boundary: est exactly n·nprobe/nlist = 250 → post_filter
    name, est = choose_backend_costed(
        stats, {"label": {"in": [0, 1, 2] + [3] * 0}}, 4, 16
    )  # in-list of 3/10 → est 300 → post
    assert name == "post_filter"
    # no filters: est = n → post_filter (an unfiltered query IS the probe)
    name, est = choose_backend_costed(stats, None, 4, 16)
    assert (name, est) == ("post_filter", 1000)
