"""Custom PySpark DataSource WRITER (Spark 4 Python data source API):
sharded JSONL training-data export —
``df.write.format("chchfr_export").mode(...).save(dir)``.

The read side of this API feeds the landing zone (`datasource.py`); this
is the symmetric sink: each task streams its Arrow batches into ONE
temp shard (`_tmp/<uuid>.jsonl`), the driver commit renames the shards
into place with deterministic final names and writes a `_SUCCESS`
manifest carrying per-shard row counts. Task retries/speculation are
safe: an abandoned attempt leaves only an orphaned temp file that both
commit and abort sweep — the rename-at-commit protocol is the same
idea as the Hadoop v1 output committer, expressed in ~60 lines.

JSONL because it is the lingua franca of training-data interchange; the
payload bytes never become Python row objects (Arrow batch → pandas →
`to_json(orient="records", lines=True)` per batch).

At 100 TB: one shard per task keeps file counts = task counts (pair
with `write_policy` repartition sizing for target shard sizes); the
driver commit is O(#shards) renames, no data movement.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_path: str
    rows: int


class ExportDataSource(DataSource):
    """Sharded JSONL export sink (batch AND streaming). Options:
    `path` (target directory), `compression` (`none` | `gzip`)."""

    @classmethod
    def name(cls) -> str:
        return "chchfr_export"

    def writer(self, schema, overwrite: bool) -> "ExportWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("chchfr_export requires a save path")
        return ExportWriter(path, overwrite, self.options.get("compression", "none"))

    def streamWriter(self, schema, overwrite: bool) -> "ExportStreamWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("chchfr_export requires a save path")
        return ExportStreamWriter(path, self.options.get("compression", "none"))


def _write_shard(path_dir: str, iterator: Iterator, compression: str) -> _ShardCommit:
    """Stream Arrow batches into one temp shard file; shared by the batch
    and streaming writers (executor side)."""
    import gzip

    tmp_dir = os.path.join(path_dir, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    ext = ".jsonl.gz" if compression == "gzip" else ".jsonl"
    tmp_path = os.path.join(tmp_dir, f"{uuid.uuid4().hex}{ext}")
    opener = gzip.open if compression == "gzip" else open
    rows = 0
    with opener(tmp_path, "wt", encoding="utf-8") as fh:
        for batch in iterator:
            pdf = batch.to_pandas()
            if len(pdf) == 0:
                continue
            rows += len(pdf)
            pdf.to_json(fh, orient="records", lines=True, force_ascii=False)
            fh.write("\n")  # lines=True omits the trailing newline
    return _ShardCommit(tmp_path=tmp_path, rows=rows)


class ExportWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool, compression: str = "none"):
        self.path = path
        self.overwrite = overwrite
        self.compression = compression

    # ---- executor side -------------------------------------------------
    def write(self, iterator: Iterator) -> _ShardCommit:
        return _write_shard(self.path, iterator, self.compression)

    # ---- driver side ---------------------------------------------------
    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        prior: list = []
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith((".jsonl", ".jsonl.gz")) or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
            start = 0
        else:
            # append: number new shards after the existing max so os.replace
            # can never clobber prior data, and carry the prior manifest
            # forward into the rewritten _SUCCESS
            start = 1 + max(
                (_shard_index(f) for f in os.listdir(self.path)), default=-1
            )
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                with open(success, encoding="utf-8") as fh:
                    prior = json.load(fh).get("shards", [])
        manifest = prior + _rename_into_place(
            self.path, messages, prefix="shard", start=start
        )
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as fh:
            json.dump(
                {"shards": manifest, "total_rows": sum(s["rows"] for s in manifest)},
                fh,
            )
        _sweep_tmp(self.path)

    def abort(self, messages) -> None:
        _drop_tmp_files(messages)
        _sweep_tmp(self.path)


class ExportStreamWriter(DataSourceStreamArrowWriter):
    """Streaming variant: every micro-batch commits its own shard set
    (`shard-b<batchId>-NNNNN.jsonl[.gz]`) plus a per-batch manifest
    (`_batch-<batchId>.json`). Exactly-once comes from the engine's
    batchId contract: a replayed micro-batch rewrites the same batch
    file names (os.replace is atomic), so retries cannot double data."""

    def __init__(self, path: str, compression: str = "none"):
        self.path = path
        self.compression = compression

    def write(self, iterator: Iterator) -> _ShardCommit:
        return _write_shard(self.path, iterator, self.compression)

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        # idempotent replay: clear any shards a failed attempt of THIS
        # batch left behind before renaming the new ones in
        for f in os.listdir(self.path):
            if f.startswith(f"shard-b{batchId:05d}-"):
                os.remove(os.path.join(self.path, f))
        manifest = _rename_into_place(
            self.path, messages, prefix=f"shard-b{batchId:05d}"
        )
        with open(
            os.path.join(self.path, f"_batch-{batchId:05d}.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump(
                {
                    "batch_id": batchId,
                    "shards": manifest,
                    "total_rows": sum(s["rows"] for s in manifest),
                },
                fh,
            )
        # all live temp files for this batch were just renamed into place,
        # so anything left in _tmp is an orphan from a crashed/speculative
        # attempt — sweep it now instead of letting it accumulate
        _sweep_tmp(self.path)

    def abort(self, messages, batchId: int) -> None:
        _drop_tmp_files(messages)


def _shard_index(fname: str) -> int:
    """Index of a batch-mode shard file (`shard-NNNNN.jsonl[.gz]`); -1 for
    anything else (manifests, streaming shards, foreign files)."""
    if not fname.startswith("shard-"):
        return -1
    stem = fname[len("shard-") :].split(".", 1)[0]
    return int(stem) if stem.isdigit() else -1


def _rename_into_place(path_dir: str, messages, prefix: str, start: int = 0) -> list:
    manifest = []
    shard_id = start
    for m in messages:
        if m is None or m.rows == 0:
            # empty/failed task: drop its temp file, emit no shard
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
            continue
        ext = ".jsonl.gz" if m.tmp_path.endswith(".gz") else ".jsonl"
        final = os.path.join(path_dir, f"{prefix}-{shard_id:05d}{ext}")
        os.replace(m.tmp_path, final)
        manifest.append({"shard": os.path.basename(final), "rows": m.rows})
        shard_id += 1
    return manifest


def _drop_tmp_files(messages) -> None:
    for m in messages or []:
        if m is not None and os.path.exists(m.tmp_path):
            os.remove(m.tmp_path)


def _sweep_tmp(path_dir: str) -> None:
    tmp_dir = os.path.join(path_dir, "_tmp")
    if os.path.isdir(tmp_dir):
        for f in os.listdir(tmp_dir):
            os.remove(os.path.join(tmp_dir, f))
        os.rmdir(tmp_dir)


def register(spark) -> None:
    spark.dataSource.register(ExportDataSource)
