"""Semantic tests for the round-5 events/ops additions: 3-step funnel,
rate limiting, cumulative distinct, table-diff checksums, MAD gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.queries import catalog
from chchfr_data_collection_spark.queries.common import T


@pytest.fixture(scope="module")
def cat():
    return catalog()


def test_funnel_steps_are_monotone(spark, sf_med, cat):
    r = cat["events_funnel_3step"].fn(spark, sf_med).collect()[0]
    assert r["n_viewers"] >= r["n_clicked"] >= r["n_purchased"] >= 0
    assert r["n_viewers"] > 0


def test_rate_limit_partitions_every_event(spark, sf_med, cat):
    from chchfr_data_collection_spark.queries.events_q import _RATE_LIMIT_N

    rows = cat["events_rate_limit"].fn(spark, sf_med).collect()
    total = T(spark, sf_med, "events").count()
    assert sum(r["n_kept"] + r["n_dropped"] for r in rows) == total
    assert all(r["n_kept"] + r["n_dropped"] == r["n_events"] for r in rows)
    # a user can never keep more than N per distinct active hour
    ev = T(spark, sf_med, "events")
    hours = {
        r["user_id"]: r["h"]
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct(F.date_trunc("hour", "ts")).alias("h"))
        .collect()
    }
    for r in rows:
        assert r["n_kept"] <= _RATE_LIMIT_N * hours[r["user_id"]]


def test_cumulative_distinct_reaches_total(spark, sf_med, cat):
    rows = sorted(
        cat["events_cumulative_distinct_users"].fn(spark, sf_med).collect(),
        key=lambda r: r["day"],
    )
    n_users = (
        T(spark, sf_med, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cum_users"] == n_users
    assert sum(r["new_users"] for r in rows) == n_users
    cum = 0
    for r in rows:
        cum += r["new_users"]
        assert r["cum_users"] == cum


def test_table_diff_flags_exactly_drifted_buckets(spark, sf_med, cat):
    from chchfr_data_collection_spark.queries.ops import _DIFF_BUCKETS

    rows = {r["bucket"]: r for r in cat["table_diff_checksum"].fn(spark, sf_med).collect()}
    dropped = {
        r[0] % _DIFF_BUCKETS
        for r in T(spark, sf_med, "orders")
        .filter(F.col("o_orderkey") % 997 == 13)
        .select("o_orderkey")
        .collect()
    }
    assert len(dropped) > 0
    for b, r in rows.items():
        assert r["buckets_match"] == (b not in dropped)


def test_mad_gate_matches_numpy(spark, sf_small, cat):
    import numpy as np

    rows = {
        r["event_type"]: r
        for r in cat["events_outliers_mad"].fn(spark, sf_small).collect()
    }
    vals = {}
    for r in T(spark, sf_small, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(round(r["value"] * 100))
    for et, vs in vals.items():
        v = np.array(vs, dtype=np.int64)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        n_out = int((np.abs(v - med) > 3 * 1.4826 * mad).sum())
        r = rows[et]
        assert r["med_cents"] == med and r["mad_cents"] == mad
        assert r["n_outliers"] == n_out


def test_exact_quantiles_match_numpy(spark, sf_small, cat):
    """p50/p95/p99 must equal the ceil-rank order statistic computed
    directly over the cents-quantized values."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_small}/events.parquet", columns=["event_type", "value"])
    vals: dict = {}
    for et, v in zip(t.column("event_type").to_pylist(), t.column("value").to_pylist()):
        vals.setdefault(et, []).append(round(v * 100))
    rows = {r["event_type"]: r for r in cat["events_exact_quantiles"].fn(spark, sf_small).collect()}
    assert set(rows) == set(vals)
    for et, vs in vals.items():
        vs.sort()
        n = len(vs)
        r = rows[et]
        assert r["n"] == n
        for pct, col in ((50, "p50_cents"), (95, "p95_cents"), (99, "p99_cents")):
            k = (n * pct + 99) // 100
            assert r[col] == vs[k - 1], (et, pct)


def test_gap_fill_grid_dense_and_ffill_correct(spark, sf_small, cat):
    """The per-type hour grid is dense (no missing hours between min and
    max), gap rows carry n=0 with the previous observed sum forward, and
    observed rows ffill to themselves."""
    from datetime import datetime, timedelta

    rows = cat["events_gap_fill"].fn(spark, sf_small).collect()
    by_t: dict = {}
    for r in rows:
        by_t.setdefault(r["event_type"], []).append(r)
    assert len(by_t) == 5
    total_gaps = 0
    for et, rs in by_t.items():
        rs.sort(key=lambda r: r["hour_ts"])
        ts = [datetime.strptime(r["hour_ts"], "%Y-%m-%d %H:%M:%S") for r in rs]
        for a, b in zip(ts, ts[1:]):
            assert b - a == timedelta(hours=1), et
        last = None
        for r in rs:
            if r["n"] == 0:
                total_gaps += 1
                assert r["sum_value"] == 0.0
                assert r["ffill_sum"] == last
            else:
                assert r["ffill_sum"] == r["sum_value"]
                last = r["sum_value"]
    assert total_gaps > 0  # sf0.001 really has gaps


def test_rfm_scores_are_quartiles(spark, sf_small, cat):
    """Every score is 1..4, each dimension's quartile populations are
    balanced up to ties, and higher monetary implies >= m_score."""
    rows = cat["customer_rfm_segmentation"].fn(spark, sf_small).collect()
    n = len(rows)
    assert n > 0
    for dim in ("r_score", "f_score", "m_score"):
        by = {}
        for r in rows:
            assert 1 <= r[dim] <= 4
            by[r[dim]] = by.get(r[dim], 0) + 1
        assert set(by) <= {1, 2, 3, 4} and len(by) >= 2


def test_markov_rows_are_distributions(spark, sf_small, cat):
    """Each prev_type's probabilities sum to 1 (exactly, up to float
    summation of exact ratios) and counts reconcile with total
    transitions = total events - distinct users with events."""
    import pyarrow.parquet as pq

    rows = cat["events_markov_transitions"].fn(spark, sf_small).collect()
    by_prev: dict = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-9, prev
    t = pq.read_table(f"{sf_small}/events.parquet", columns=["user_id"])
    users = set(t.column("user_id").to_pylist())
    n_events = t.num_rows
    assert sum(r["n"] for r in rows) == n_events - len(users)


def test_pareto_concentration_sane(spark, sf_small, cat):
    """Top customers by whole-dollar bucket cover >= 80% of revenue with
    a fraction strictly between 0 and 1; recompute independently."""
    import duckdb

    r = cat["customer_pareto_concentration"].fn(spark, sf_small).collect()[0]
    assert 0 < r["n_top"] <= r["n_customers"]
    assert 0 < r["top_fraction"] <= 1.0
    assert r["revenue_share"] >= 0.8
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_small}/orders.parquet'")
    cust = con.sql("""
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) c,
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2))) / 100.0) AS BIGINT) m
      FROM orders GROUP BY o_custkey""").fetchall()
    total = sum(c for c, m in cust)
    from collections import defaultdict

    h = defaultdict(lambda: [0, 0])
    for c, m in cust:
        h[m][0] += 1
        h[m][1] += c
    cum, n_top, share = 0, 0, 0
    for m in sorted(h, reverse=True):
        if cum * 5 < total * 4:
            n_top += h[m][0]
            share += h[m][1]
        cum += h[m][1]
    assert r["n_top"] == n_top
    assert abs(r["revenue_share"] - share / total) < 1e-12


def test_dau_wau_stickiness_bounds(spark, sf_small, cat):
    """WAU >= DAU for every day, stickiness in (0, 1], and the first
    day's WAU equals its DAU (no prior days in the window)."""
    rows = sorted(
        cat["events_dau_wau_stickiness"].fn(spark, sf_small).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    for r in rows:
        assert r["wau"] >= r["dau"] > 0
        assert 0 < r["stickiness"] <= 1.0
    assert rows[0]["wau"] == rows[0]["dau"]
