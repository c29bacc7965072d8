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
        from pyspark.sql import types as T

        text = spark.createDataFrame([(p,) for p in payloads], "payload string")
        if spec.envelope:
            # envelope object, e.g. Mobil {"Locations": [...]}
            doc_schema: T.DataType = spec.raw_schema
        else:
            # bare JSON array of records (BP dialect, S1 in SURVEY.md §2.1)
            doc_schema = T.ArrayType(
                spec.raw_schema, containsNull=True
            )
        raw = text.select(
            F.from_json(F.col("payload"), doc_schema, {"mode": mode}).alias("doc")
        )
        if spec.envelope:
            raw = raw.select("doc.*")
        else:
            return raw.select(F.explode_outer("doc").alias("rec")).select("rec.*")
    else:
        raise ValueError("need path or payloads")

    if spec.envelope:
        # envelope unwrap, e.g. Mobil {"Locations": [...]} — explode the array
        raw = raw.select(F.explode_outer(F.col(spec.envelope)).alias("rec")).select(
            "rec.*"
        )
    return raw


def conform(raw: DataFrame, spec: SourceSpec) -> DataFrame:
    """Project a raw dialect frame onto the canonical gas_station columns."""
    out = raw.select(*spec.columns())
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
