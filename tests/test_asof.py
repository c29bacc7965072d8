"""As-of and range join operator tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from chchfr_data_collection_spark.operators.asof import asof_join, range_join


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_asof_join_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(12)), (3, "u2", _ts(9))],
        "event_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(9)), ("u1", _ts(11)), ("u2", _ts(11))],
        "user_id string, click_ts timestamp",
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="click_ts",
        right_value="click_ts", out_col="last_click",
    )
    got = {r.event_id: r.last_click for r in out.collect()}
    assert got[1] == _ts(9)     # latest click <= 10:00
    assert got[2] == _ts(11)    # latest click <= 12:00
    assert got[3] is None       # u2's only click is after 09:00


def test_asof_join_tie_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "event_id int, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10))], "user_id string, click_ts timestamp"
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="click_ts",
        right_value="click_ts", out_col="last_click",
    )
    assert out.collect()[0].last_click == _ts(10)  # <= semantics


def test_range_join_half_open(spark):
    points = spark.createDataFrame([(1, 0.0), (2, 5.0), (3, 99.9)], "id int, v double")
    ranges = spark.createDataFrame(
        [("low", 0.0, 5.0), ("high", 5.0, 100.0)], "bucket string, lo double, hi double"
    )
    out = range_join(points, ranges, "v", "lo", "hi")
    got = {r.id: r.bucket for r in out.collect()}
    # lo <= v < hi: 5.0 lands in 'high', not 'low'
    assert got == {1: "low", 2: "high", 3: "high"}
