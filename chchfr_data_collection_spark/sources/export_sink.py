"""Custom PySpark DataSource WRITER (Spark 4 Python data source API):
sharded JSONL training-data export —
``df.write.format("chchfr_export").mode(...).save(dir)``.

The read side of this API feeds the landing zone (`datasource.py`); this
is the symmetric sink: each task streams its Arrow batches into ONE
temp shard (`_tmp/<uuid>.jsonl`), the driver commit renames the shards
into place with deterministic final names and writes a `_SUCCESS`
manifest carrying per-shard row counts. Task retries/speculation are
safe: an abandoned attempt leaves only an orphaned temp file that
commit ignores and abort sweeps — the rename-at-commit protocol is the
same idea as the Hadoop v1 output committer, expressed in ~60 lines.

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
    WriterCommitMessage,
)


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_path: str
    rows: int


class ExportDataSource(DataSource):
    """Sharded JSONL export sink. Options: `path` (target directory)."""

    @classmethod
    def name(cls) -> str:
        return "chchfr_export"

    def writer(self, schema, overwrite: bool) -> "ExportWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("chchfr_export requires a save path")
        return ExportWriter(path, overwrite)


class ExportWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    # ---- executor side -------------------------------------------------
    def write(self, iterator: Iterator) -> _ShardCommit:
        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp_path = os.path.join(tmp_dir, f"{uuid.uuid4().hex}.jsonl")
        rows = 0
        with open(tmp_path, "w", encoding="utf-8") as fh:
            for batch in iterator:
                pdf = batch.to_pandas()
                if len(pdf) == 0:
                    continue
                rows += len(pdf)
                pdf.to_json(fh, orient="records", lines=True, force_ascii=False)
                fh.write("\n")  # lines=True omits the trailing newline
        return _ShardCommit(tmp_path=tmp_path, rows=rows)

    # ---- driver side ---------------------------------------------------
    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
        manifest = []
        shard_id = 0
        for m in messages:
            if m is None or m.rows == 0:
                # empty task: drop its empty temp file, emit no shard
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)
                continue
            final = os.path.join(self.path, f"shard-{shard_id:05d}.jsonl")
            os.replace(m.tmp_path, final)
            manifest.append({"shard": os.path.basename(final), "rows": m.rows})
            shard_id += 1
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as fh:
            json.dump(
                {"shards": manifest, "total_rows": sum(s["rows"] for s in manifest)},
                fh,
            )
        self._sweep_tmp()

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        self._sweep_tmp()

    def _sweep_tmp(self) -> None:
        tmp_dir = os.path.join(self.path, "_tmp")
        if os.path.isdir(tmp_dir):
            for f in os.listdir(tmp_dir):
                os.remove(os.path.join(tmp_dir, f))
            os.rmdir(tmp_dir)


def register(spark) -> None:
    spark.dataSource.register(ExportDataSource)
