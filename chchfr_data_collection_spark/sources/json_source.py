"""JSON landing-zone source.

The reference fetches each API inside the task process and iterates the
parsed payload row by row (dag_collection_data_from_bp.py:25-35,39-57).
At 100 TB the fetch and the transform must separate: payloads land
immutably in a landing zone (one JSON document per fetch), and Spark
reads them with an explicit schema — schema inference over 100 TB of
JSON is a full extra pass, so it is never used here.

`read_payloads` accepts either a path glob (the scale path — a
distributed `spark.read.json`) or in-memory payload strings (the test
path). Strict specs surface corrupt records via FAILFAST (the moral
equivalent of the reference's KeyError ⇒ retry); lenient specs default
missing fields to null like the reference's `.get()` chains
(dag_collection_data_from_z.py:73-81) — and an unfetchable/empty payload
becomes an explicit empty-DataFrame-with-schema, not a silent success.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .specs import SourceSpec


def read_payloads(
    spark: SparkSession,
    spec: SourceSpec,
    path: str | None = None,
    payloads: Sequence[str] | None = None,
) -> DataFrame:
    """Raw payloads -> one row per record (envelope exploded), raw dialect columns."""
    mode = "FAILFAST" if spec.strict else "PERMISSIVE"
    if path is not None:
        raw = (
            spark.read.schema(spec.raw_schema)
            .option("mode", mode)
            .option("multiLine", "true")
            .json(path)
        )
    elif payloads is not None:
        text = spark.createDataFrame([(p,) for p in payloads], "payload string")
        return parse_payload_docs(text, spec)
    else:
        raise ValueError("need path or payloads")

    if spec.envelope:
        # envelope unwrap, e.g. Mobil {"Locations": [...]} — explode the array
        raw = raw.select(F.explode_outer(F.col(spec.envelope)).alias("rec")).select(
            "rec.*"
        )
    return raw


def parse_payload_docs(
    docs: DataFrame, spec: SourceSpec, keep: Sequence[str] = ()
) -> DataFrame:
    """One raw payload DOCUMENT per row -> one record per row: the single
    place the dialect's parse policy lives (envelope unwrap vs bare
    array, strict FAILFAST vs lenient PERMISSIVE). `keep` carries
    passthrough columns (e.g. provenance) alongside the records."""
    from pyspark.sql import types as T

    mode = "FAILFAST" if spec.strict else "PERMISSIVE"
    if spec.envelope:
        # envelope object, e.g. Mobil {"Locations": [...]}
        doc_schema: T.DataType = spec.raw_schema
    else:
        # bare JSON array of records (BP dialect, S1 in SURVEY.md §2.1)
        doc_schema = T.ArrayType(spec.raw_schema, containsNull=True)
    parsed = docs.select(
        F.from_json(F.col("payload"), doc_schema, {"mode": mode}).alias("doc"), *keep
    )
    arr = F.col(f"doc.{spec.envelope}") if spec.envelope else F.col("doc")
    return parsed.select(F.explode_outer(arr).alias("rec"), *keep).select(
        "rec.*", *keep
    )


def conform(raw: DataFrame, spec: SourceSpec, keep: Sequence[str] = ()) -> DataFrame:
    """Project a raw dialect frame onto the canonical gas_station columns
    (plus `keep` passthrough columns, e.g. file provenance)."""
    out = raw.select(*spec.columns(), *keep)
    # drop rows with no key (lenient sources may produce them); strict
    # sources would already have failed the scan
    return out.filter(F.col("location_id").isNotNull())


def read_conformed(
    spark: SparkSession,
    spec: SourceSpec,
    path: str | None = None,
    payloads: Sequence[str] | None = None,
) -> DataFrame:
    df = conform(read_payloads(spark, spec, path, payloads), spec)
    return df.withColumn("source", F.lit(spec.name)).withColumn(
        "source_priority", F.lit(spec.priority)
    )
