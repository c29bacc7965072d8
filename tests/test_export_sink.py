"""chchfr_export sink: sharded JSONL write with rename-at-commit."""

from __future__ import annotations

import json
import os

from chchfr_data_collection_spark.session import load_table
from chchfr_data_collection_spark.sources.export_sink import register


def _read_manifest(path):
    with open(os.path.join(path, "_SUCCESS"), encoding="utf-8") as fh:
        return json.load(fh)


def test_export_roundtrip_and_manifest(spark, sf_small, tmp_path):
    register(spark)
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "export")
    docs.repartition(4).write.format("chchfr_export").mode("overwrite").save(out)

    manifest = _read_manifest(out)
    n = docs.count()
    assert manifest["total_rows"] == n
    assert sum(s["rows"] for s in manifest["shards"]) == n
    shards = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert shards == sorted(s["shard"] for s in manifest["shards"])
    assert not os.path.exists(os.path.join(out, "_tmp"))  # committed clean

    # JSONL round-trip: Spark's own json reader recovers every row
    back = spark.read.json(out + "/*.jsonl")
    assert back.count() == n
    a = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    b = {int(r.doc_id): (r.text, r.lang) for r in back.collect()}
    assert a == b


def test_export_overwrite_replaces_shards(spark, sf_small, tmp_path):
    register(spark)
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    out = str(tmp_path / "export2")
    docs.repartition(8).write.format("chchfr_export").mode("overwrite").save(out)
    first = set(os.listdir(out))
    docs.limit(10).repartition(1).write.format("chchfr_export").mode(
        "overwrite"
    ).save(out)
    manifest = _read_manifest(out)
    assert manifest["total_rows"] == 10
    # old shards are gone, not merged with
    assert sum(1 for f in os.listdir(out) if f.endswith(".jsonl")) < len(first)


def test_export_empty_frame_writes_manifest_only(spark, sf_small, tmp_path):
    register(spark)
    docs = load_table(spark, sf_small, "documents").filter("doc_id < 0")
    out = str(tmp_path / "export3")
    docs.write.format("chchfr_export").mode("overwrite").save(out)
    manifest = _read_manifest(out)
    assert manifest == {"shards": [], "total_rows": 0}
    assert [f for f in os.listdir(out) if f.endswith(".jsonl")] == []
