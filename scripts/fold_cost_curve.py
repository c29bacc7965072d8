"""Measured tiered-fold cost curve (round-14 verdict, next #5): the
O(deltas) maintenance claim is structurally asserted (bounded folds
leave standing generations byte-identical) — this script MEASURES it.

At each fixture SF the corpus grows ~10x while the DELTA SIZE IS HELD
CONSTANT: the store is bootstrapped from the full corpus and folded
into one standing generation, two constant-size deltas land, and we
time (a) the BOUNDED fold (`compact(merge_ratio=None)` — consumes the
two deltas only) and (b) the FULL fold (`compact(merge_ratio=0)` —
pulls the corpus generation back in). The contract: (a) stays flat as
the corpus grows 100x, (b) tracks corpus bytes. Covers the batch-store
layout (IvfAssignmentStore) and the round-15 ComponentStore layout.

Usage: SPARK_GRAFT_CPUS=16 python3 scripts/fold_cost_curve.py
Prints one JSON line per (store, sf) and a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from chchfr_data_collection_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _dir_bytes(store, path) -> int:
    from chchfr_data_collection_spark.operators.store_base import _iter_files

    fs, HPath = store._fs()
    return sum(st.getLen() for st in _iter_files(fs, HPath, path))


def ivf_row(spark, sf_dir: str) -> dict:
    """The embeddings fixture barely scales across SFs (500 -> 2000
    vectors), so the CORPUS here is assignment rows derived from
    lineitem (60k -> 6M rows per decade) in the store's own schema —
    the fold cost under measurement is bytes-moved, which is what the
    lineitem-derived relation scales."""
    from chchfr_data_collection_spark.streaming.embeddings import (
        IvfAssignmentStore,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    corpus = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("vec_id"),
        F.col("l_extendedprice").cast("double").alias("cos_c"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(64))
        .cast("long")
        .alias("cent_id"),
    )
    base = tempfile.mkdtemp(prefix=f"foldcurve_ivf_{uuid.uuid4().hex[:6]}_")
    store = IvfAssignmentStore(spark, base)
    store.bootstrap(corpus)
    store.append_batch(corpus.limit(1), 1)  # second fold source
    store.compact(merge_ratio=0)  # corpus -> one standing generation
    for b in (2, 3):
        delta = corpus.limit(500).withColumn(
            "vec_id", F.col("vec_id") + 10_000_000 * b
        )
        store.append_batch(delta, b)
    corpus_rows = corpus.count()
    corpus_bytes = _dir_bytes(store, store.data_path)
    t0 = time.monotonic()
    r = store.compact(merge_ratio=None)  # bounded: the two deltas only
    bounded_s = time.monotonic() - t0
    assert r["compacted"] is True and all(v >= 0 for v in r["folded"]), r
    t0 = time.monotonic()
    r2 = store.compact(merge_ratio=0)  # full: pulls the corpus gen
    full_s = time.monotonic() - t0
    assert r2["compacted"] is True and any(v < 0 for v in r2["folded"]), r2
    return {
        "store": "IvfAssignmentStore",
        "sf": sf_dir.rsplit("sf", 1)[1],
        "corpus_rows": corpus_rows,
        "corpus_bytes": corpus_bytes,
        "delta_rows": 1000,
        "bounded_fold_s": round(bounded_s, 3),
        "full_fold_s": round(full_s, 3),
    }


def cc_row(spark, sf_dir: str) -> dict:
    from chchfr_data_collection_spark.operators.component_store import (
        ComponentStore,
    )

    # same scaling note as ivf_row: near-dup pairs over documents
    # barely scale, so the corpus graph derives from lineitem edges
    # (l_orderkey chains linking line numbers): 60k -> 6M edges
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = li.select(
        (F.col("l_orderkey") * 10).alias("da"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("db"),
    )
    base = tempfile.mkdtemp(prefix=f"foldcurve_cc_{uuid.uuid4().hex[:6]}_")
    store = ComponentStore(spark, base)
    store.bootstrap(pairs)
    store.apply_pairs(
        spark.createDataFrame([(1, 1)], "da: bigint, db: bigint"), "seed2"
    )
    store.compact(merge_ratio=0)  # corpus -> one standing generation
    # constant deltas: 200 synthetic fresh-node pairs each
    for i in (0, 1):
        delta = [
            (10_000_000 + 1000 * i + j, 10_000_000 + 1000 * i + j + 500)
            for j in range(200)
        ]
        store.apply_pairs(
            spark.createDataFrame(delta, "da: bigint, db: bigint"), f"w{i}"
        )
    corpus_rows = store.labels().count()
    corpus_bytes = _dir_bytes(store, store.gens_path) + _dir_bytes(
        store, store.assign_path
    )
    t0 = time.monotonic()
    r = store.compact(merge_ratio=None)  # bounded: the two patches only
    bounded_s = time.monotonic() - t0
    assert r["compacted"] is True and r["folded_gids"] == [], r
    t0 = time.monotonic()
    r2 = store.compact(merge_ratio=0)  # full: pulls both generations
    full_s = time.monotonic() - t0
    assert r2["compacted"] is True and len(r2["folded_gids"]) == 2, r2
    return {
        "store": "ComponentStore",
        "sf": sf_dir.rsplit("sf", 1)[1],
        "corpus_rows": corpus_rows,
        "corpus_bytes": corpus_bytes,
        "delta_rows": 400,
        "bounded_fold_s": round(bounded_s, 3),
        "full_fold_s": round(full_s, 3),
    }


def main() -> int:
    spark = get_spark("fold_cost_curve")
    rows = []
    for sf in SFS:
        for fn in (ivf_row, cc_row):
            row = fn(spark, sf)
            rows.append(row)
            print(json.dumps(row), flush=True)
    print("\n| Store | SF | corpus rows | corpus MB | bounded fold s | full fold s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['store']} | {r['sf']} | {r['corpus_rows']} | "
            f"{r['corpus_bytes'] / 1e6:.1f} | {r['bounded_fold_s']} | "
            f"{r['full_fold_s']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
