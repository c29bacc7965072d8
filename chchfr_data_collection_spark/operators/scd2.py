"""SCD2 (slowly-changing dimension, type 2) without a MERGE-capable
table format.

The reference's dimension handling is SCD0 (insert-if-absent, K1): a
station's attributes never update. SCD2 is what a real warehouse does
instead — keep every historical version with a validity interval. With
Delta this is one MERGE; on plain parquet it is the anti-join + union +
window composition below (the pyspark guide's "CDC/SCD2" emulation):

- rows whose key is not in the batch pass through unchanged;
- current rows matched by the batch with DIFFERENT attributes are
  closed (valid_to = batch ts);
- changed/new keys append a new open version (valid_to = null);
- matched rows with identical attributes are left untouched (no
  spurious versions), which keeps re-runs idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _attrs_equal(attrs: Sequence[str], left: str, right: str) -> Column:
    cond = F.lit(True)
    for a in attrs:
        cond = cond & (
            F.col(f"{left}.{a}").eqNullSafe(F.col(f"{right}.{a}"))
        )
    return cond


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    batch_ts: Column,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Fold one change batch into an SCD2 dimension.

    `dim` columns: keys + attrs + valid_from + valid_to (null = current).
    `batch` columns: keys + attrs. Returns the new dimension state.
    """
    d = dim.alias("d")
    # explicit presence marker: a matched key must not be inferred from
    # attribute nullness (batch rows may carry legitimate NULL attributes)
    b = batch.withColumn("__present", F.lit(1)).alias("b")
    keylist = list(keys)
    same = _attrs_equal(attrs, "d", "b")

    current = d.filter(F.col(f"d.{to_col}").isNull())
    history = d.filter(F.col(f"d.{to_col}").isNotNull())

    joined = current.join(b, keylist, "left")
    batch_has_key = F.col("b.__present").isNotNull()
    # rows to keep open: key absent from batch, or attributes unchanged
    untouched = joined.filter(~batch_has_key | same).select("d.*")
    # rows to close: matched with changed attributes
    closed = (
        joined.filter(batch_has_key & ~same)
        .select("d.*")
        .withColumn(to_col, batch_ts.cast("timestamp"))
    )
    # new versions: batch rows that are new keys OR changed attributes
    existing_same = current.alias("d").join(b, keylist, "inner").filter(same)
    new_versions = (
        b.join(existing_same.select(*[f"d.{k}" for k in keylist]), keylist, "left_anti")
        .withColumn(from_col, batch_ts.cast("timestamp"))
        .withColumn(to_col, F.lit(None).cast("timestamp"))
        .select(*keylist, *attrs, from_col, to_col)
    )
    return history.unionByName(untouched).unionByName(closed).unionByName(new_versions)
