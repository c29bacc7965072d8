"""Dump `.explain("formatted")` for the round-15-touched entries.

Usage: python scripts/dump_r15_plans.py OUTDIR SUFFIX [sf_dir]
Writes OUTDIR/<entry>_<SUFFIX>.txt for each entry in ENTRIES.
Run once from the pre-round worktree (SUFFIX=before) and once from the
optimized tree (SUFFIX=after); the judge diffs the pair against the
claims in OPTIMIZATION_r15.md.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chchfr_data_collection_spark.queries import catalog  # noqa: E402
from chchfr_data_collection_spark.session import get_spark  # noqa: E402

ENTRIES = [
    # plan-construction family (SQL-string expression rendering)
    "similarity_lsh_ann",
    "similarity_lsh_multiprobe",
    "similarity_lsh_scaled",
    "similarity_filtered_ann",
    "embedding_random_projection",
    "similarity_ivf_ann",
    "dedup_semantic_multiprobe",
    "similarity_pq_trained",
    # Python-boundary column pruning
    "applyinpandas_group_rank",
    # store write-path entries (rebalance-on-write + overlapped jobs);
    # the returned probe view is the inspectable plan — the write-side
    # changes show up as the smaller file counts the probe scans
    "dedup_minhash_incremental",
    "similarity_ivf_store_compacted_probe",
    "store_fleet_sync_probe",
]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans_r15")
    cat = catalog()
    for name in ENTRIES:
        df = cat[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("dumped", name)
    spark.stop()


if __name__ == "__main__":
    main()
