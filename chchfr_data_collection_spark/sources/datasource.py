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
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(self.suffix)
        )
        # empty landing zone -> one empty partition (a scan of nothing is
        # a valid day with no fetches, not an error)
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8") as fh:
            yield fh.read(), os.path.basename(partition.path)


def register(spark) -> None:
    spark.dataSource.register(LandingDataSource)


def read_landing_conformed(spark, spec, landing_dir: str):
    """Landing zone -> canonical stations frame: the Python source lists
    and reads raw documents; everything after (from_json, envelope
    explode, projection, null-key filter) is the existing JVM path."""
    from pyspark.sql import functions as F

    register(spark)
    raw_docs = spark.read.format("chchfr_landing").load(landing_dir)
    mode = "FAILFAST" if spec.strict else "PERMISSIVE"
    if spec.envelope:
        doc_schema = spec.raw_schema
        parsed = raw_docs.select(
            F.from_json("payload", doc_schema, {"mode": mode}).alias("doc"), "src_file"
        ).select(F.explode_outer(f"doc.{spec.envelope}").alias("rec"), "src_file")
    else:
        from pyspark.sql import types as T

        doc_schema = T.ArrayType(spec.raw_schema, containsNull=True)
        parsed = raw_docs.select(
            F.from_json("payload", doc_schema, {"mode": mode}).alias("doc"), "src_file"
        ).select(F.explode_outer("doc").alias("rec"), "src_file")
    flat = parsed.select("rec.*", "src_file")
    # conform() would drop the provenance column; apply the same
    # projection + null-key filter with src_file carried through
    out = flat.select(*spec.columns(), "src_file").filter(
        F.col("location_id").isNotNull()
    )
    return out.withColumn("source", F.lit(spec.name)).withColumn(
        "source_priority", F.lit(spec.priority)
    )
