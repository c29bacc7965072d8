"""Incremental-rollup merge algebra + schema-evolution union."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.rollup import (
    merge_rollup,
    rollup_partials,
)
from chchfr_data_collection_spark.queries import catalog


@pytest.fixture(scope="module")
def cat():
    return catalog()


def test_merge_rollup_overlapping_keys(spark):
    """A key present in both base and increment reduces to one row with
    summed counts/totals and extrema of extrema."""
    from decimal import Decimal

    base = spark.createDataFrame(
        [("a", 2, Decimal("10.00"), 1.0, 9.0), ("b", 1, Decimal("5.00"), 5.0, 5.0)],
        "k string, n long, total decimal(12,2), vmin double, vmax double",
    )
    incr = spark.createDataFrame(
        [("a", 3, Decimal("7.50"), 0.5, 4.0)],
        "k string, n long, total decimal(12,2), vmin double, vmax double",
    )
    got = {r["k"]: r for r in merge_rollup(base, incr).collect()}
    assert got["a"]["n"] == 5
    assert float(got["a"]["total"]) == 17.50
    assert got["a"]["vmin"] == 0.5 and got["a"]["vmax"] == 9.0
    assert got["b"]["n"] == 1


def test_incremental_equals_full_recompute(spark, sf_small):
    """Splitting the fact at ANY cutoff and merging partials must equal
    the single-pass rollup — the lossless-partials property."""
    from chchfr_data_collection_spark.session import load_table

    ev = load_table(spark, sf_small, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    full = rollup_partials(ev, day, "event_type")
    for cutoff in ("2024-01-05", "2024-01-15"):
        c = F.lit(cutoff).cast("timestamp")
        merged = merge_rollup(
            rollup_partials(ev.filter(F.col("ts") < c), day, "event_type"),
            rollup_partials(ev.filter(F.col("ts") >= c), day, "event_type"),
        )
        a = sorted(map(tuple, full.collect()))
        b = sorted(map(tuple, merged.collect()))
        assert a == b, cutoff


def test_merge_shuffles_rollup_not_fact(spark, sf_small, cat):
    """The merge aggregates ROLLUP-sized unions; the fact scans feed
    partial aggregation map-side, so the plan carries no join and only
    aggregation exchanges."""
    from chchfr_data_collection_spark.plans.audit import count_nodes

    df = cat["events_rollup_incremental"].fn(spark, sf_small)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert count_nodes(df, node) == 0


def test_bucketed_join_has_zero_join_shuffles(spark, sf_small, cat):
    """THE bucketing claim: both sides pre-bucketed on the join key →
    the SortMergeJoin consumes buckets directly; the only exchange in
    the whole plan is the final tiny aggregation."""
    from chchfr_data_collection_spark.plans.audit import (
        assert_max_shuffles,
        count_nodes,
    )

    # disable broadcast so the tiny fixture exercises the big-big path
    # the bucketing exists for (at real scale neither side broadcasts)
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        df = cat["bucketed_join_colocated"].fn(spark, sf_small)
        assert count_nodes(df, "SortMergeJoin") == 1
        assert_max_shuffles(df, 1)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_schema_evolution_nulls_missing_columns(spark, sf_small, cat):
    """v1 rows surface with NULL in the column only v2 carries; no row
    is dropped and no column is misaligned."""
    rows = cat["schema_evolution_union"].fn(spark, sf_small).collect()
    v1 = [r for r in rows if r["location_id"] % 2 == 0]
    v2 = [r for r in rows if r["location_id"] % 2 == 1]
    assert v1 and v2
    assert all(r["postal_code"] is None for r in v1)
    assert all(r["postal_code"] == str(r["location_id"] * 37) for r in v2)


def test_retention_funnel_anomaly_plan_shapes(spark, sf_small, cat):
    """The three analytics additions: no cartesian anywhere; the anomaly
    filter's stats arrive as broadcasts so the outlier scan is the only
    fact-sized stage."""
    from chchfr_data_collection_spark.plans.audit import count_nodes

    for name in (
        "events_retention_cohort",
        "events_funnel_click_purchase",
        "events_anomaly_3sigma",
    ):
        df = cat[name].fn(spark, sf_small)
        assert count_nodes(df, "CartesianProduct") == 0, name
    anomaly = cat["events_anomaly_3sigma"].fn(spark, sf_small)
    assert count_nodes(anomaly, "BroadcastHashJoin") >= 1


def test_hll_rollup_contracts_hold(spark, sf_small, cat):
    out = cat["events_rollup_hll_incremental"].fn(spark, sf_small).collect()
    assert out
    for r in out:
        assert r["merge_consistent"] and r["hll_ok"], r


def test_partition_pruned_read_resolves_at_planning(spark, sf_small, cat):
    """The single-day filter must land in PartitionFilters (directory
    pruning at planning time), not as a data filter over the whole
    layout."""
    from chchfr_data_collection_spark.plans.audit import formatted_plan

    df = cat["partition_pruned_read"].fn(spark, sf_small)
    plan = formatted_plan(df)
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "day" in pf.group(1), plan[:2000]
