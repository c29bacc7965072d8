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


def test_export_append_preserves_existing_shards(spark, sf_small, tmp_path):
    """Append mode must not clobber prior shards: new shards are numbered
    after the existing max and _SUCCESS merges both generations."""
    register(spark)
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    out = str(tmp_path / "export_append")
    docs.repartition(3).write.format("chchfr_export").mode("overwrite").save(out)
    first = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    n = docs.count()

    docs.limit(10).repartition(2).write.format("chchfr_export").mode(
        "append"
    ).save(out)
    after = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    # every first-generation shard is still present, plus the new ones
    assert set(first) <= set(after)
    manifest = _read_manifest(out)
    assert manifest["total_rows"] == n + 10
    assert sorted(s["shard"] for s in manifest["shards"]) == after
    # shard indices are unique (no overwrite could have happened)
    assert len({f.split(".")[0] for f in after}) == len(after)
    back = spark.read.json(out + "/*.jsonl")
    assert back.count() == n + 10


def test_export_empty_frame_writes_manifest_only(spark, sf_small, tmp_path):
    register(spark)
    docs = load_table(spark, sf_small, "documents").filter("doc_id < 0")
    out = str(tmp_path / "export3")
    docs.write.format("chchfr_export").mode("overwrite").save(out)
    manifest = _read_manifest(out)
    assert manifest == {"shards": [], "total_rows": 0}
    assert [f for f in os.listdir(out) if f.endswith(".jsonl")] == []


def test_export_gzip_shards_readable(spark, sf_small, tmp_path):
    register(spark)
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    out = str(tmp_path / "export_gz")
    (docs.repartition(2).write.format("chchfr_export")
        .option("compression", "gzip").mode("overwrite").save(out))
    shards = [f for f in os.listdir(out) if f.endswith(".jsonl.gz")]
    assert shards and all(f.endswith(".jsonl.gz") for f in shards)
    back = spark.read.json(out + "/*.jsonl.gz")  # Spark decompresses by ext
    assert back.count() == docs.count()
    assert _read_manifest(out)["total_rows"] == docs.count()


def test_export_stream_per_batch_commit(spark, sf_small, tmp_path):
    """Streaming sink: AvailableNow replay of events writes per-batch
    shards + batch manifests; total rows equal the batch count."""
    from chchfr_data_collection_spark.streaming.events import read_events_stream

    register(spark)
    out = str(tmp_path / "export_stream")
    ck = str(tmp_path / "ck")
    stream = read_events_stream(spark, sf_small).select("event_id", "event_type")
    q = (stream.writeStream.format("chchfr_export")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    batches = sorted(f for f in os.listdir(out) if f.startswith("_batch-"))
    assert batches, os.listdir(out)
    total = 0
    for b in batches:
        with open(os.path.join(out, b), encoding="utf-8") as fh:
            m = json.load(fh)
        for s in m["shards"]:
            assert os.path.exists(os.path.join(out, s["shard"]))
        total += m["total_rows"]
    n = load_table(spark, sf_small, "events").count()
    assert total == n
    back = spark.read.json(out + "/*.jsonl")
    assert back.count() == n
    # streaming commit sweeps orphaned temp files, same as the batch path
    assert not os.path.exists(os.path.join(out, "_tmp"))
