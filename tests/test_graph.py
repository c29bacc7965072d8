"""Alternating star-contraction connected components (round-9 verdict
item 3): union-find equivalence on adversarial shapes, O(log n) round
counts on chains (the shape where min-label propagation paid
O(diameter)), and the reliable-checkpoint option (item 5)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.graph import (
    connected_components,
    materialize,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            find(a)
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_dict(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "da long, db long")
    out = connected_components(df, **kw).collect()
    got = {r.node: r.component for r in out}
    assert len(out) == len(got), "duplicate node rows in CC output"
    return got


@pytest.mark.parametrize(
    "name, pairs",
    [
        ("chain", [(i, i + 1) for i in range(63)]),
        ("reversed_chain", [(i + 1, i) for i in range(63)]),
        ("two_cliques_bridge",
         [(a, b) for a in range(8) for b in range(a + 1, 8)]
         + [(a, b) for a in range(100, 108) for b in range(a + 1, 108)]
         + [(5, 105)]),
        ("star_already", [(0, i) for i in range(1, 30)]),
        ("self_loops_and_pair", [(3, 3), (4, 5), (5, 4)]),
        # the multi-parent trap: small-star can emit one child under two
        # different minima while neither is a child — the convergence
        # check's second clause exists for exactly this family
        ("multi_parent", [(6, 5), (7, 5), (6, 1), (7, 2)]),
    ],
)
def test_cc_equals_union_find(spark, name, pairs):
    got = _cc_dict(spark, pairs)
    assert got == _union_find(pairs), name


def test_cc_random_graphs_equal_union_find(spark):
    rng = random.Random(20260815)
    for trial in range(3):
        n = [300, 60, 1000][trial]
        m = [250, 400, 700][trial]  # sparse, dense, forest-ish
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        assert _cc_dict(spark, pairs) == _union_find(pairs), f"trial {trial}"


def test_cc_chain_converges_in_log_rounds(spark):
    """THE round-9 point: a 64-link chain (diameter 64) converges in
    O(log n) star-contraction rounds where min-label propagation needed
    ~diameter rounds — each round is the same join+groupBy shuffle
    shape, so round count IS the wall-clock bill at 100 TB."""
    pairs = [(i, i + 1) for i in range(64)]
    rounds = []
    got = _cc_dict(spark, pairs, rounds_out=rounds)
    assert got == _union_find(pairs)
    assert rounds[0] <= 8, f"expected O(log n) rounds, got {rounds[0]}"


def test_cc_raises_instead_of_returning_unconverged(spark):
    """An unconverged CC is a WRONG dedup clustering; the loud error is
    the contract (the old implementation silently returned whatever
    max_iter left behind)."""
    pairs = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(pairs, "da long, db long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_cc_reliable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint_dir swaps localCheckpoint for a parquet round-trip:
    identical components, and the round state actually lands under the
    directory (what an executor-loss replay would re-read)."""
    rng = random.Random(11)
    pairs = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    ckpt = str(tmp_path / "cc-ckpt")
    local = _cc_dict(spark, pairs)
    reliable = _cc_dict(spark, pairs, checkpoint_dir=ckpt)
    assert reliable == local
    landed = list((tmp_path / "cc-ckpt").rglob("*.parquet"))
    assert landed, "reliable mode landed no round state"


def test_materialize_reliable_roundtrip_exact(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 7).alias("v")
    )
    back = materialize(df, str(tmp_path), "slot-a")
    assert sorted((r.id, r.v) for r in back.collect()) == sorted(
        (r.id, r.v) for r in df.collect()
    )


def test_pagerank_and_kmeans_checkpoint_dir_exact(spark, tmp_path):
    """The reliable-checkpoint flag on the other two iterative
    operators changes fault tolerance, never values: rows identical to
    the default path (which the DuckDB oracle already pins)."""
    from chchfr_data_collection_spark.queries.llm import embedding_kmeans_iter
    from chchfr_data_collection_spark.queries.scale_ops import (
        graph_pagerank_trade,
    )

    sf = "/root/testdata/sf0.001"
    pr0 = {(r.node, r.rank_q) for r in graph_pagerank_trade(spark, sf).collect()}
    pr1 = {
        (r.node, r.rank_q)
        for r in graph_pagerank_trade(
            spark, sf, checkpoint_dir=str(tmp_path / "pr")
        ).collect()
    }
    assert pr1 == pr0
    km0 = {
        (r.cent_id, r.pos, r.c_val, r.n_assigned)
        for r in embedding_kmeans_iter(spark, sf).collect()
    }
    km1 = {
        (r.cent_id, r.pos, r.c_val, r.n_assigned)
        for r in embedding_kmeans_iter(
            spark, sf, checkpoint_dir=str(tmp_path / "km")
        ).collect()
    }
    assert km1 == km0
