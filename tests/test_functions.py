"""Scalar-function tests (SURVEY.md §2.4 F1–F4, §5.2 edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chchfr_data_collection_spark.functions.prices import (
    BASE_PRICES,
    JITTER_HIGH,
    JITTER_LOW,
    base_prices_df,
    with_deterministic_price,
    with_random_price,
)
from chchfr_data_collection_spark.functions.strings import (
    full_address,
    value_after_last_comma,
)


def _col1(df):
    return [r[0] for r in df.collect()]


def test_value_after_last_comma_edge_cases(spark):
    cases = [
        ("12 Main St, Riccarton, Christchurch", "Christchurch"),
        ("no comma here", ""),            # no comma -> ''
        ("trailing,", ""),                # comma at end -> '' (after trim)
        ("a,b ,  c  ", "c"),              # whitespace trimmed
        ("", ""),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "vicinity string")
    out = _col1(df.select(value_after_last_comma("vicinity")))
    assert out == [want for _, want in cases]


def test_full_address_postal_branch(spark):
    df = spark.createDataFrame(
        [
            ("1 High St", "Chch", "Canterbury", "NZ", "8011"),
            ("1 High St", "", "", "NZ", ""),  # empty components KEPT
            ("1 High St", "Chch", "Canterbury", "NZ", None),
        ],
        "address_line1 string, city string, state_province string, "
        "country string, postal_code string",
    )
    out = _col1(df.select(full_address()))
    assert out == [
        "1 High St, Chch, Canterbury, NZ 8011",
        "1 High St, , , NZ",
        "1 High St, Chch, Canterbury, NZ",
    ]


def test_random_price_bounds_and_determinism(spark):
    base = base_prices_df(spark)
    stations = spark.range(200).select(F.col("id").alias("location_id"))
    priced = with_random_price(stations.crossJoin(F.broadcast(base)), seed=7)
    rows = priced.collect()
    assert len(rows) == 200 * len(BASE_PRICES)
    for r in rows:
        lo = round(r.base_price + JITTER_LOW, 2)
        hi = round(r.base_price + JITTER_HIGH, 2)
        assert lo <= r.price <= hi, r
        # two decimal places
        assert r.price == round(r.price, 2)
    again = with_random_price(stations.crossJoin(F.broadcast(base)), seed=7).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_deterministic_price_engine_independent(spark):
    base = base_prices_df(spark)
    stations = spark.range(50).select(F.col("id").alias("location_id"))
    out = with_deterministic_price(
        stations.crossJoin(F.broadcast(base)), key="location_id"
    )
    rows = out.collect()
    for r in rows:
        expected_jitter = (r.location_id * 7919) % 61 / 100.0 + JITTER_LOW
        assert r.price == round(r.base_price + expected_jitter, 2)


def test_vector_sql_and_column_paths_agree(spark):
    """Round-15 ADVICE (low): the SQL-string fast paths must stay
    arithmetic-identical to the column-API kernels they shadow —
    including the QUANT literal, now derived from the one constant.
    Pins (a) bit-identical values on edge data (half-ulp rounding
    cases included) and (b) identical canonicalized analyzed plans,
    so a future edit to one path cannot silently desynchronize the
    other."""
    from chchfr_data_collection_spark.functions import vectors as V

    df = spark.createDataFrame(
        [
            ([0.1, -0.25, 7.9999995], [1.5, 0.0000005, -2.0]),
            ([-0.0000005, 3.25, -7.75], [0.5, -0.5, 0.0]),
        ],
        "a: array<float>, b: array<float>",
    )

    def _canon(col):
        # optimized plan: constant folding normalizes spellings like
        # CAST(0 AS DOUBLE) vs 0.0d that are trivially equal but not
        # canonically so in the analyzed tree
        return (
            df.select(col.alias("x"))
            ._jdf.queryExecution()
            .optimizedPlan()
            .canonicalized()
            .toString()
        )

    from pyspark.sql import functions as F

    pairs = [
        (V.dot("a", "b"), V.dot(F.col("a"), F.col("b"))),
        (V.quantize("a"), V.quantize(F.col("a"))),
        (V.dot_exact("a", "b"), V.dot_exact(F.col("a"), F.col("b"))),
    ]
    for s_col, c_col in pairs:
        got_s = df.select(s_col.alias("x")).collect()
        got_c = df.select(c_col.alias("x")).collect()
        assert got_s == got_c
        assert _canon(s_col) == _canon(c_col)
    # the already-quantized kernels have no Column twin; pin their SQL
    # against a straightforward spelled-out equivalent instead
    q = df.select(
        V.quantize("a").alias("qa"), V.quantize("b").alias("qb")
    )
    spelled = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT),"
        " (acc, v) -> acc + v)"
    )
    assert (
        q.select(V.dot_q("qa", "qb").alias("x")).collect()
        == q.select(spelled.alias("x")).collect()
    )
