"""Plan regression tests for the Q2/4/7/8/11/12/15/16/17/20/21 shapes:
pin the broadcast/pushdown/pruning properties each depends on at scale.
"""

from __future__ import annotations

import pytest

from chchfr_data_collection_spark.plans.audit import (
    assert_pushed_filter,
    assert_read_columns,
    count_nodes,
)
from chchfr_data_collection_spark.queries import catalog


@pytest.fixture(scope="module")
def cat():
    return catalog()


def test_q2_all_dims_broadcast(spark, sf_small, cat):
    """Every dimension is filtered-then-broadcast; the only shuffle is
    the per-part window. No cartesian, no shuffled join."""
    df = cat["q2_min_cost_supplier"].fn(spark, sf_small)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "CartesianProduct") == 0
    assert_pushed_filter(df, "part", "p_size")
    assert_read_columns(
        df, "lineitem", {"l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"}
    )


def test_q4_semi_join_pruned(spark, sf_small, cat):
    """The EXISTS probe scans exactly two lineitem columns and the
    quarter filter reaches the orders scan."""
    df = cat["q4_order_priority_check"].fn(spark, sf_small)
    assert_pushed_filter(df, "orders", "o_orderdate")
    assert_read_columns(df, "lineitem", {"l_orderkey", "l_shipdate"})
    assert count_nodes(df, "CartesianProduct") == 0


def test_q7_ship_window_pushed(spark, sf_small, cat):
    """The two-year ship window prunes the fact scan; the nation filter
    shrinks supplier before any fact row moves."""
    df = cat["q7_volume_shipping"].fn(spark, sf_small)
    assert_pushed_filter(df, "lineitem", "l_shipdate")
    assert count_nodes(df, "CartesianProduct") == 0
    assert count_nodes(df, "BroadcastHashJoin") >= 2


def test_q8_part_filter_first(spark, sf_small, cat):
    """The part-type filter broadcasts and shrinks lineitem before the
    orders join; region reaches customer as a broadcast."""
    df = cat["q8_market_share"].fn(spark, sf_small)
    assert_pushed_filter(df, "part", "p_type")
    assert_pushed_filter(df, "orders", "o_orderdate")
    assert count_nodes(df, "CartesianProduct") == 0


def test_q11_single_bnlj_for_scalar(spark, sf_small, cat):
    """The grand-total threshold is a 1-row broadcast: exactly one
    nested-loop join, no shuffled join, 4-column fact scan."""
    df = cat["q11_important_stock"].fn(spark, sf_small)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 1
    assert_read_columns(
        df, "lineitem", {"l_partkey", "l_suppkey", "l_extendedprice", "l_discount"}
    )


def test_q12_year_filter_pushed(spark, sf_small, cat):
    df = cat["q12_shipmode_priority"].fn(spark, sf_small)
    assert_pushed_filter(df, "lineitem", "l_shipdate")
    assert_read_columns(df, "lineitem", {"l_orderkey", "l_linestatus", "l_shipdate"})
    assert_read_columns(df, "orders", {"o_orderkey", "o_orderdate", "o_orderpriority"})


def test_q15_revenue_view_pruned(spark, sf_small, cat):
    """The revenue view scans 4 pruned columns with the quarter pushed;
    supplier and the scalar max both broadcast."""
    df = cat["q15_top_supplier"].fn(spark, sf_small)
    assert_pushed_filter(df, "lineitem", "l_shipdate")
    assert_read_columns(
        df, "lineitem", {"l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"}
    )
    assert count_nodes(df, "SortMergeJoin") == 0


def test_q16_anti_join_broadcast(spark, sf_small, cat):
    """The complaint-supplier exclusion is a broadcast anti-join; part
    filters push to its scan; nothing shuffles except the distinct agg."""
    df = cat["q16_supplier_part_counts"].fn(spark, sf_small)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert_pushed_filter(df, "part", "p_brand")
    assert_read_columns(df, "lineitem", {"l_partkey", "l_suppkey"})


def test_q17_correlated_avg_shape(spark, sf_small, cat):
    """Part filter broadcasts; the correlated AVG is a window after the
    broadcast join, so the only shuffle is on l_partkey."""
    df = cat["q17_small_quantity_revenue"].fn(spark, sf_small)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert_read_columns(
        df, "lineitem", {"l_partkey", "l_quantity", "l_extendedprice"}
    )


def test_q20_nested_semi_chain(spark, sf_small, cat):
    """The inner aggregate reduces lineitem to supplier keys before the
    supplier table is touched; every join broadcasts."""
    df = cat["q20_part_promotion_suppliers"].fn(spark, sf_small)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert_pushed_filter(df, "lineitem", "l_shipdate")
    assert_pushed_filter(df, "part", "p_name")
    assert_read_columns(
        df, "lineitem", {"l_partkey", "l_suppkey", "l_quantity", "l_shipdate"}
    )


def test_q21_one_window_pass(spark, sf_small, cat):
    """The three per-order statistics share one window partitioning:
    the plan carries a single l_orderkey sort for all three, supplier
    broadcasts, and the orders status filter is pushed."""
    df = cat["q21_waiting_suppliers"].fn(spark, sf_small)
    assert_pushed_filter(df, "orders", "o_orderstatus")
    assert_read_columns(df, "orders", {"o_orderkey", "o_orderstatus"})
    assert_read_columns(df, "lineitem", {"l_orderkey", "l_suppkey", "l_shipdate"})
    assert count_nodes(df, "CartesianProduct") == 0
    # all three windows fold into one Window node
    assert count_nodes(df, "Window") <= 2
