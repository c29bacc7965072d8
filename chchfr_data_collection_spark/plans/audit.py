"""Physical-plan audit helpers: assert the plan properties that matter
at 100 TB, as code, so they can't silently regress.

A query that is correct at sf0.01 but reads all columns, misses a
filter pushdown, or turns a broadcast-able dimension join into a
sort-merge shuffle will fall over at scale. These helpers parse
`explain("formatted")` output and let tests pin the plan shape:

- filters reached the parquet scan (`PushedFilters`)
- column pruning reached the scan (`ReadSchema`)
- small sides broadcast (`BroadcastHashJoin` / `BroadcastNestedLoopJoin`)
- shuffle (`Exchange`) counts stay at the designed minimum
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text, captured as a string."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def scans(plan: str) -> list[dict]:
    """Parse every parquet scan node: location, pushed filters, read schema."""
    out = []
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if not b.startswith("Scan parquet"):
            continue
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", b)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", b)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", b)
        cols = []
        if schema and schema.group(1):
            cols = [c.split(":")[0] for c in schema.group(1).split(",")]
        out.append(
            {
                "location": loc.group(1) if loc else "",
                "pushed": pushed.group(1) if pushed else "",
                "columns": cols,
            }
        )
    return out


def scan_for(plan: str, table: str) -> list[dict]:
    return [s for s in scans(plan) if f"{table}.parquet" in s["location"]]


def assert_pushed_filter(df: DataFrame, table: str, column: str) -> None:
    """At least one scan of `table` has a pushed filter on `column`."""
    plan = formatted_plan(df)
    matches = scan_for(plan, table)
    assert matches, f"no parquet scan of {table} in plan"
    assert any(column in s["pushed"] for s in matches), (
        f"no pushed filter on {column} in scans of {table}: "
        f"{[s['pushed'] for s in matches]}"
    )


def assert_read_columns(df: DataFrame, table: str, max_columns: set) -> None:
    """Every scan of `table` reads only a subset of `max_columns` (pruned)."""
    plan = formatted_plan(df)
    matches = scan_for(plan, table)
    assert matches, f"no parquet scan of {table} in plan"
    for s in matches:
        extra = set(s["columns"]) - set(max_columns)
        assert not extra, f"scan of {table} reads unpruned columns {extra}"


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node type, e.g. 'Exchange',
    'BroadcastHashJoin', 'SortMergeJoin', 'CartesianProduct'."""
    plan = formatted_plan(df)
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", plan))


def assert_broadcast_not_shuffle_join(df: DataFrame) -> None:
    """All joins in the plan are broadcast-side (hash or nested-loop);
    no sort-merge / shuffled-hash join, no cartesian product."""
    assert count_nodes(df, "SortMergeJoin") == 0, "unexpected SortMergeJoin"
    assert count_nodes(df, "ShuffledHashJoin") == 0, "unexpected ShuffledHashJoin"
    assert count_nodes(df, "CartesianProduct") == 0, "unexpected CartesianProduct"


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    """The plan has at most `n` shuffle Exchanges (BroadcastExchange
    excluded — broadcasts move a dimension, not the fact table)."""
    plan = formatted_plan(df)
    ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert ex <= n, f"{ex} shuffle exchanges, designed max {n}\n{plan}"
