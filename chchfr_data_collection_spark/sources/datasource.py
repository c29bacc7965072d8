"""Custom PySpark DataSource (Spark 4 Python data source API) for the
payload landing zone: `spark.read.format("chchfr_landing").load(dir)`.

Division of labor mirrors the engine's UDF policy: Python does ONLY
what must be Python — enumerating/fetching payload documents (this is
where the reference's `get_remote_json()` HTTP call lives at ingest,
dag_collection_data_from_bp.py:25-35) — and yields each document as one
raw string row. Parsing, envelope explode, and dialect projection stay
JVM-side (`json_source.read_payloads` / `conform`), where Catalyst can
prune and codegen them.

Partitioning: one input partition per payload file, so a landing zone
with N fetch batches parses with N-way parallelism and a fetch-retry
of one file re-reads one partition, not the zone.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class LandingDataSource(DataSource):
    """Raw payload documents from a landing directory: one row per file,
    columns (payload string, src_file string)."""

    @classmethod
    def name(cls) -> str:
        return "chchfr_landing"

    def schema(self) -> str:
        return "payload string, src_file string"

    def reader(self, schema) -> "LandingReader":
        return LandingReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class LandingReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("chchfr_landing requires a load path")
        self.suffix = options.get("suffix", ".json")

    def partitions(self):
        # Recursive walk: land_payload writes nested
        # {source}/batch={id}/payload.json layouts, and a flat dir of
        # *.json files is the degenerate single-level case of the same
        # walk — both shapes enumerate here.
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, names in os.walk(self.path)
            for f in names
            if f.endswith(self.suffix)
        )
        # empty landing zone -> one empty partition (a scan of nothing is
        # a valid day with no fetches, not an error)
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8") as fh:
            # relpath keeps batch provenance for nested layouts and
            # degenerates to the bare filename for flat ones
            yield fh.read(), os.path.relpath(partition.path, self.path)


def register(spark) -> None:
    spark.dataSource.register(LandingDataSource)


def read_landing_conformed(spark, spec, landing_dir: str):
    """Landing zone -> canonical stations frame: the Python source lists
    and reads raw documents; parse + projection are the SAME JVM helpers
    the inline-payload path uses (json_source.parse_payload_docs /
    conform), with the file-provenance column carried through."""
    from pyspark.sql import functions as F

    from .json_source import conform, parse_payload_docs

    register(spark)
    raw_docs = spark.read.format("chchfr_landing").load(landing_dir)
    flat = parse_payload_docs(raw_docs, spec, keep=("src_file",))
    out = conform(flat, spec, keep=("src_file",))
    return out.withColumn("source", F.lit(spec.name)).withColumn(
        "source_priority", F.lit(spec.priority)
    )
