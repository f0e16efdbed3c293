"""As-of and range join operator semantics."""

from datetime import datetime

import pytest

from hybrid_vector_search_spark.operators.asof import (
    asof_join_backward,
    range_join_count,
)

L_DDL = "lid LONG, k LONG, ts TIMESTAMP"
R_DDL = "rid LONG, k LONG, rts TIMESTAMP"


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (0, 1, datetime(2024, 1, 1, 0, 30)),   # after r0, before r1
            (1, 1, datetime(2024, 1, 1, 1, 0)),    # exactly at r1 → inclusive
            (2, 1, datetime(2023, 12, 31, 0, 0)),  # before any right row
            (3, 2, datetime(2024, 1, 1, 5, 0)),    # key with no right rows
        ],
        L_DDL,
    )
    right = spark.createDataFrame(
        [
            (100, 1, datetime(2024, 1, 1, 0, 0)),
            (101, 1, datetime(2024, 1, 1, 1, 0)),
            (102, 1, datetime(2024, 1, 1, 2, 0)),
        ],
        R_DDL,
    )
    return left, right


def test_asof_backward_inclusive(frames):
    left, right = frames
    out = {
        r.lid: r.rid
        for r in asof_join_backward(
            left, right, on="k", left_time="ts", right_time="rts"
        ).collect()
    }
    assert out[0] == 100   # most recent at-or-before 00:30
    assert out[1] == 101   # equal timestamps match (inclusive)
    assert out[2] is None  # nothing prior
    assert out[3] is None  # key absent on right
    assert len(out) == 4   # exactly one output row per left row


def test_range_join_count(frames):
    left, right = frames
    out = {
        r.lid: r.n_in_range
        for r in range_join_count(
            left, right, on="k", left_time="ts", right_time="rts",
            window_seconds=3600,
        ).collect()
    }
    # lid 0 @00:30: r100 @00:00 in (23:30, 00:30] → 1
    # lid 1 @01:00: r100 (> 00:00 exclusive lower bound? 00:00 > 00:00 false)
    #               + r101 @01:00 inclusive upper → 1
    assert out[0] == 1
    assert out[1] == 1
    assert out[2] == 0 and out[3] == 0
