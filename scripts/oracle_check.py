"""Local twin of the driver's t2 gate: run every catalog query on Spark
and its oracle SQL on DuckDB, compare row count, column names, and
(order-insensitively) values. Exact comparison — catalog queries are
designed to be bit-identical across engines.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from chchfr_data_collection_spark.queries import catalog
from chchfr_data_collection_spark.session import TABLES, get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the hash-relevant kind: 'i' int,
    'f' float, 'b' bool, 't' any date/datetime representation,
    's' strings, 'dec' Decimal, '?' empty/unknown object."""
    k = s.dtype.kind
    if k in "iu":
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k == "M":
        return "t"
    if k == "O":
        import datetime
        import decimal

        for v in s:
            if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
                continue
            if isinstance(v, (datetime.date, datetime.datetime)):
                return "t"
            if isinstance(v, bool):
                return "b"
            if isinstance(v, int):
                # object-dtype ints only arise from DuckDB int128 paths;
                # Spark toPandas never yields them, so a distinct kind
                # guarantees the mismatch is flagged.
                return "i-obj"
            if isinstance(v, decimal.Decimal):
                return "dec"
            if isinstance(v, str):
                return "s"
            return type(v).__name__
        return "?"
    return k


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    if len(s) == len(d):
        for c in s.columns:
            sv, dv = s[c], d[c]
            # Dtype-KIND parity guards the driver's value-hash: DuckDB
            # HUGEINT (any SUM/window-SUM promotion) lands in pandas as
            # float64 or object-int128, which hashes differently from
            # Spark's int64 even at equal values (VERDICT r2 item 1 —
            # pack_sequence_boundaries). Driver-green history shows int
            # WIDTH (int32 vs int64) and date REPRESENTATION (object
            # date vs datetime64, ns vs us) are hash-safe, so only kind
            # mismatches are flagged.
            sk, dk = _dtype_kind(sv), _dtype_kind(dv)
            # Empty results carry no values to hash, so dtype kind is
            # meaningless there ('?' vs the other engine's declared
            # type) — a 0-row match is a match.
            if len(s) == 0:
                continue
            # (s, t) is allowed: Spark date-formatted strings vs DuckDB
            # DATE hashed equal in every driver row that hit the class
            # (q18_large_orders, fuel_price_crossjoin,
            # pipeline_daily_prices r2), because midnight-pure
            # datetime64 stringifies to the bare ISO date; the value
            # comparison below still catches content differences.
            if sk != dk and {sk, dk} != {"s", "t"}:
                problems.append(
                    f"col {c}: dtype kind spark={sv.dtype}({sk}) duck={dv.dtype}({dk})"
                    " — HUGEINT/typing hazard: CAST the oracle column to the Spark type"
                )
            if str(sv.dtype).startswith("float") or str(dv.dtype).startswith("float"):
                import numpy as np

                sva = sv.astype(float).to_numpy()
                dva = dv.astype(float).to_numpy()
                both_nan = pd.isna(sva) & pd.isna(dva)
                exact = (sva == dva) | both_nan
                if not exact.all():
                    bad = int((~exact).sum())
                    worst = float(
                        abs(pd.Series(sva[~exact]) - pd.Series(dva[~exact])).max()
                    )
                    problems.append(f"col {c}: {bad} float mismatches, max |d|={worst:g}")
            else:
                if not sv.astype(str).equals(dv.astype(str)):
                    bad = int((sv.astype(str) != dv.astype(str)).sum())
                    ex = None
                    for i in range(len(sv)):
                        if str(sv.iloc[i]) != str(dv.iloc[i]):
                            ex = (str(sv.iloc[i]), str(dv.iloc[i]))
                            break
                    problems.append(f"col {c}: {bad} value mismatches, e.g. {ex}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duck_con(sf_dir)
    cat = catalog()
    failed = []
    for name, q in sorted(cat.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception:
            failed.append(name)
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            continue
        if q.sql is None:
            print(f"ok   {name}: rows-only, {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(q.sql).fetchdf()
        except Exception:
            failed.append(name)
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(sdf)} rows match")
    print(f"\n{len(failed)} failures of {len(cat)} queries" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
