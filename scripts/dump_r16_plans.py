"""Dump `.explain("formatted")` for the round-16-touched entries.

Usage: python scripts/dump_r16_plans.py OUTDIR SUFFIX [sf_dir]
Writes OUTDIR/<entry>_<SUFFIX>.txt for each entry in ENTRIES.
Run once from the pre-round worktree (SUFFIX=before) and once from the
optimized tree (SUFFIX=after); the judge diffs the pair against the
claims in OPTIMIZATION_r16.md.
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
    # min-hash SQL-text plan construction (shingle_signatures /
    # band_rows / pair-explode): the executed plans are the equivalence
    # evidence — same Exchange count, same expressions
    "dedup_minhash_banded",
    "dedup_minhash_incremental",
    "dedup_minhash_probe_only",
    "decontaminate_minhash",
    "curation_pipeline_incremental",
    # CC family: size-gated patch-land rebalance + lazy round
    # checkpoints (returned label view; write-side evidence is file
    # counts + the A/B in OPTIMIZATION_r16.md)
    "dedup_connected_components",
    "dedup_cc_incremental",
    "dedup_cc_incremental_persisted",
    # retrain one-pass training materialization
    "similarity_ivf_store_retrain_full",
    # Arrow-boundary pruning, now with a headline bench number
    "applyinpandas_group_rank",
]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans_r16")
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
