"""Relational-breadth batch 2: outer-join distribution (Q13 shape),
max-over-CTE (Q15), having semi-join (Q18), disjunctive pushdown (Q19),
market share (Q8), scalar-subquery anti-join (Q22 shape), lag windows,
running totals. Invariants checked against independent pandas/duckdb
computations on sf0.001."""

import duckdb
import pandas as pd
import pytest

from hybrid_vector_search_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def pdf(name):
    return pd.read_parquet(f"{SF_DIR}/{name}.parquet")


def test_q13_distribution_partitions_customers(spark):
    out = QUERIES["tpch_q13_customer_distribution"](spark, SF_DIR).toPandas()
    cust, orders = pdf("customer"), pdf("orders")
    # the distribution is a partition of all customers
    assert out["custdist"].sum() == len(cust)
    # per-customer order counts recomputed in pandas
    counts = (
        orders.groupby("o_custkey").size().reindex(cust["c_custkey"], fill_value=0)
    )
    expected = counts.value_counts()
    got = dict(zip(out["c_count"], out["custdist"]))
    assert got == {int(k): int(v) for k, v in expected.items()}


def test_q15_rows_are_all_at_max(spark):
    out = QUERIES["tpch_q15_top_supplier"](spark, SF_DIR).toPandas()
    assert len(out) >= 1
    assert out["total_revenue"].nunique() == 1
    assert list(out["s_suppkey"]) == sorted(out["s_suppkey"])


def test_q18_threshold_and_order(spark):
    out = QUERIES["tpch_q18_large_orders"](spark, SF_DIR).toPandas()
    li = pdf("lineitem")
    per_order = li.groupby("l_orderkey")["l_quantity"].sum()
    big = per_order[per_order > 200]
    assert len(out) == min(50, len(big))
    assert (out["total_qty"] > 200).all()
    assert list(out["total_qty"]) == sorted(out["total_qty"], reverse=True)
    # every returned order's quantity matches the pandas recomputation
    for ok, tq in zip(out["o_orderkey"], out["total_qty"]):
        assert per_order[ok] == tq


def test_q19_matches_duckdb_count(spark):
    out = QUERIES["tpch_q19_disjunctive_revenue"](spark, SF_DIR).toPandas()
    assert len(out) == 1
    con = duckdb.connect()
    n = con.execute(
        f"""SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet' l
        JOIN '{SF_DIR}/part.parquet' p ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)"""
    ).fetchone()[0]
    assert int(out["n_items"].iloc[0]) == n


def test_q8_share_bounded_and_year_sorted(spark):
    out = QUERIES["tpch_q8_market_share"](spark, SF_DIR).toPandas()
    assert len(out) >= 1
    assert ((out["mkt_share"] >= 0.0) & (out["mkt_share"] <= 1.0)).all()
    assert list(out["o_year"]) == sorted(out["o_year"])


def test_idle_rich_customers_threshold(spark):
    out = QUERIES["idle_rich_customers"](spark, SF_DIR).toPandas()
    cust, orders = pdf("customer"), pdf("orders")
    avg_bal = cust.loc[cust["c_acctbal"] > 0, "c_acctbal"].mean()
    recent = set(
        orders.loc[orders["o_orderdate"] >= pd.Timestamp("2000-01-01"), "o_custkey"]
    )
    sel = cust[
        (cust["c_acctbal"] > round(avg_bal, 6))
        & ~cust["c_custkey"].isin(recent)
    ]
    assert out["n_cust"].sum() == len(sel)
    expected = sel.groupby("c_mktsegment").size()
    got = dict(zip(out["c_mktsegment"], out["n_cust"]))
    assert got == {k: int(v) for k, v in expected.items()}


def test_interarrival_gap_semantics(spark):
    out = QUERIES["events_user_interarrival"](spark, SF_DIR).toPandas()
    ev = pdf("events").sort_values(["user_id", "ts", "event_id"])
    gaps = ev.assign(
        gap=ev.groupby("user_id")["ts"].diff().dt.total_seconds() * 1_000_000
    ).dropna(subset=["gap"])
    # gap count per type (gap attributed to the later event)
    expected_n = gaps.groupby("event_type").size()
    got_n = dict(zip(out["event_type"], out["n_gaps"]))
    assert got_n == {k: int(v) for k, v in expected_n.items()}
    assert (out["avg_gap_us"] > 0).all()


def test_daily_cumulative_monotone_and_total(spark):
    out = QUERIES["events_daily_cumulative"](spark, SF_DIR).toPandas()
    ev = pdf("events")
    for etype, grp in out.groupby("event_type"):
        grp = grp.sort_values("day")
        # running count is the prefix sum of the daily counts
        assert list(grp["cum_events"]) == list(grp["n_events"].cumsum())
        assert grp["cum_events"].iloc[-1] == (ev["event_type"] == etype).sum()
        # running value never decreases (values are non-negative)
        assert (grp["cum_value"].diff().dropna() >= -1e-9).all()


def test_trailing_7d_window_semantics(spark):
    """RANGE frame: each row's trailing total equals the sum of day
    counts within [day-6, day] for that event type."""
    out = QUERIES["events_trailing_7d"](spark, SF_DIR).toPandas()
    ev = pdf("events")
    ev = ev.assign(day=ev.ts.dt.strftime("%Y-%m-%d"))
    daily = ev.groupby(["event_type", "day"]).size()
    for r in out.itertuples():
        import datetime as dt

        d = dt.date.fromisoformat(r.day)
        lo = (d - dt.timedelta(days=6)).isoformat()
        expected = sum(
            v
            for (etype, day), v in daily.items()
            if etype == r.event_type and lo <= day <= r.day
        )
        assert r.trailing_7d_events == expected
