"""SemDeDup (dedup_semantic_clusters): independent numpy recompute of
the full cluster->pair->survivorship pipeline, plus plan shape."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from chchfr_data_collection_spark.plans.audit import count_nodes
from chchfr_data_collection_spark.queries import catalog
from chchfr_data_collection_spark.queries.llm import (
    _SEMDEDUP_K,
    _SEMDEDUP_THRESHOLD,
)


@pytest.fixture(scope="module")
def cat():
    return catalog()


def _quant(m: np.ndarray) -> np.ndarray:
    # round half away from zero, matching Spark/DuckDB ROUND
    return np.where(
        m >= 0,
        np.floor(m * 1e6 + 0.5),
        np.ceil(m * 1e6 - 0.5),
    ).astype(np.int64)


def _recompute(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    order = np.argsort(ids)
    ids, q = ids[order], _quant(emb[order])
    norms = {int(i): int((row * row).sum()) for i, row in zip(ids, q)}
    cent_ids = [int(i) for i in ids if i < _SEMDEDUP_K]
    by_id = {int(i): row for i, row in zip(ids, q)}

    def cos(a: int, b: int) -> float:
        d = int(by_id[a] @ by_id[b])
        return d / (math.sqrt(norms[a]) * math.sqrt(norms[b]))

    assign = {}
    for v in ids:
        v = int(v)
        best = max(cent_ids, key=lambda c: (cos(v, c), -c))
        assign[v] = best
    dropped = {}
    for v in ids:
        v = int(v)
        doms = [
            (cos(u, v), -u)
            for u in ids
            if int(u) < v and assign[int(u)] == assign[v] and cos(int(u), v) >= _SEMDEDUP_THRESHOLD
        ]
        if doms:
            c, negu = max(doms)
            dropped[v] = (assign[v], -negu, c)
    return dropped


def test_semdedup_matches_numpy_recompute(spark, sf_small, cat):
    got = {
        int(r["vec_id"]): (int(r["cent_id"]), int(r["dup_of"]), float(r["cos_sim"]))
        for r in cat["dedup_semantic_clusters"].fn(spark, sf_small).collect()
    }
    want = _recompute(sf_small)
    assert set(got) == set(want)
    for v, (cent, rep, c) in want.items():
        gcent, grep, gc = got[v]
        assert (gcent, grep) == (cent, rep)
        assert gc == pytest.approx(c, rel=0, abs=1e-12)


def test_semdedup_pair_stage_is_equijoin(spark, sf_small, cat):
    """The within-cluster pair join must be a hash/broadcast equi-join on
    cent_id — never a cartesian (the entire point of SemDeDup)."""
    df = cat["dedup_semantic_clusters"].fn(spark, sf_small)
    assert count_nodes(df, "CartesianProduct") == 0


def test_semdedup_drops_are_cluster_local(spark, sf_small, cat):
    """Every (vec_id, dup_of) pair shares a cluster and dup_of < vec_id."""
    rows = cat["dedup_semantic_clusters"].fn(spark, sf_small).collect()
    for r in rows:
        assert r["dup_of"] < r["vec_id"]
        assert r["cos_sim"] >= _SEMDEDUP_THRESHOLD


def test_ivf_trained_shape_and_cell_locality(spark, sf_small, cat):
    """Trained-IVF: 3 results per query vector with dense ranks, no
    self-matches, and the plan has no cartesian product (cell locality
    itself is pinned bit-exactly by the DuckDB oracle, which replays
    training AND assignment)."""
    df = cat["similarity_ivf_trained"].fn(spark, sf_small)
    assert count_nodes(df, "CartesianProduct") == 0
    rows = df.collect()
    by_q: dict = {}
    for r in rows:
        assert r["cid"] != r["qid"] and r["qid"] < 5 and 1 <= r["rnk"] <= 3
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == set(range(5))
    for q, rs in by_q.items():
        assert sorted(r["rnk"] for r in rs) == [1, 2, 3]
