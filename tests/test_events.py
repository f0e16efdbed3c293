"""Events operators: tumbling window, sessionization, props extraction."""

from datetime import datetime

import pytest

from hybrid_vector_search_spark.operators import events as EV


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 1: two events 10 min apart (one session), third 40 min later
        (0, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, '{"k": 5}'),
        (1, datetime(2024, 1, 1, 0, 10, 0), 1, "click", 2.0, '{"k": 7}'),
        (2, datetime(2024, 1, 1, 0, 50, 0), 1, "view", 3.0, "{}"),
        # user 2: single event; gap exactly 30min to the next → same session
        (3, datetime(2024, 1, 1, 1, 0, 0), 2, "view", 4.0, '{"k": 1}'),
        (4, datetime(2024, 1, 1, 1, 30, 0), 2, "purchase", 5.0, '{"k": 2}'),
        # same-timestamp tie for user 2 → event_id breaks the tie
        (5, datetime(2024, 1, 1, 1, 30, 0), 2, "view", 6.0, None),
    ]
    return spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )


def test_tumbling_window_counts(tiny_events):
    out = {
        (r.window_start, r.event_type): r.n_events
        for r in EV.tumbling_window_agg(tiny_events, "1 hour").collect()
    }
    assert out[("2024-01-01 00:00:00", "view")] == 2
    assert out[("2024-01-01 00:00:00", "click")] == 1
    assert out[("2024-01-01 01:00:00", "view")] == 2
    assert out[("2024-01-01 01:00:00", "purchase")] == 1


def test_sessionize_gap_semantics(tiny_events):
    rows = {
        r.event_id: r.session_seq
        for r in EV.sessionize(tiny_events, 30).collect()
    }
    # user 1: 0,1 together (10min gap); 2 starts a new session (40min > 30)
    assert rows[0] == 1 and rows[1] == 1 and rows[2] == 2
    # user 2: exactly-30min gap does NOT break the session (strict >)
    assert rows[3] == 1 and rows[4] == 1 and rows[5] == 1


def test_session_stats_span(tiny_events):
    stats = {
        (r.user_id, r.session_seq): r
        for r in EV.session_stats(tiny_events, 30).collect()
    }
    s11 = stats[(1, 1)]
    assert s11.n_events == 2 and s11.span_sec == 600
    assert s11.session_start == "2024-01-01 00:00:00"
    assert stats[(2, 1)].n_events == 3


def test_props_profile_null_and_empty_json(tiny_events):
    out = {r.event_type: r for r in EV.props_profile(tiny_events).collect()}
    # views: k present in 2 of 4 events ({} and NULL props yield NULL k)
    assert out["view"].n_events == 4 and out["view"].n_with_k == 2
    assert out["purchase"].avg_k == 2.0


def test_funnel_strict_ordering(spark):
    ddl = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    t = lambda m: datetime(2024, 1, 1, 0, m, 0)  # noqa: E731
    rows = [
        # user 1 completes the funnel in order
        (0, t(0), 1, "view", 0.0, None),
        (1, t(5), 1, "click", 0.0, None),
        (2, t(9), 1, "purchase", 0.0, None),
        # user 2 clicks BEFORE their first view -> stops at view stage
        (3, t(1), 2, "click", 0.0, None),
        (4, t(2), 2, "view", 0.0, None),
        (5, t(3), 2, "purchase", 0.0, None),  # purchase without valid click
        # user 3 views then clicks, never purchases
        (6, t(0), 3, "view", 0.0, None),
        (7, t(8), 3, "click", 0.0, None),
        # user 4 only purchases -> counted nowhere
        (8, t(4), 4, "purchase", 0.0, None),
    ]
    out = EV.funnel_counts(spark.createDataFrame(rows, ddl)).collect()[0]
    assert out.n_view == 3  # users 1, 2, 3
    assert out.n_view_click == 2  # users 1, 3 (user 2's click preceded view)
    assert out.n_view_click_purchase == 1  # user 1 only
