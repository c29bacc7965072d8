"""Full-catalog timing record: EVERY registered query at sf0.1.

bench.py covers the 74-query headline set; the remaining ~160 catalog
entries had no recorded per-query time, so a perf regression there was
invisible (round-7 verdict, What's missing #5). This script times the
WHOLE catalog once, interleaved, then gives the headline set two more
passes (so headline numbers stay comparable to bench.py's
interleaved best-of-3 protocol while the long tail costs one pass).

Prints ONE JSON line:
  {"metric": "full_catalog_wall_clock_total", "value": total_sec,
   "unit": "sec", "queries": {name: best_sec}, "sf": ...,
   "n_queries": N, "passes": {...}, "errors": {...}, "loadavg": [..]}

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python3 scripts/bench_full.py > BENCH_LOCAL_rN.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from chchfr_data_collection_spark.queries import catalog  # noqa: E402
from chchfr_data_collection_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench-full")
    cat = catalog()
    names = sorted(cat)
    spark.range(1).count()  # absorb JVM/session startup

    load_before = os.getloadavg()[0]
    passes: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}

    def run(name: str) -> None:
        if name in errors:
            return
        t0 = time.perf_counter()
        try:
            cat[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # one broken query must not zero the record
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            return
        passes[name].append(round(time.perf_counter() - t0, 3))

    for name in names:  # pass 1: the whole catalog, interleaved
        run(name)
    for _ in range(2):  # passes 2-3: headline only (bench.py protocol)
        for name in HEADLINE:
            run(name)
    load_after = os.getloadavg()[0]

    timings = {
        n: (min(ts) if ts else {"err": errors.get(n, "no passes")})
        for n, ts in passes.items()
    }
    total = round(sum(t for t in timings.values() if isinstance(t, float)), 3)
    print(
        json.dumps(
            {
                "metric": "full_catalog_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(names),
                "protocol": "full catalog 1 interleaved pass; headline set "
                "best-of-3 (2 extra passes, bench.py protocol)",
                "loadavg": [round(load_before, 2), round(load_after, 2)],
                "passes": passes,
                "errors": errors,
            }
        )
    )
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
