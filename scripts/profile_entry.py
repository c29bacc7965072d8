"""Per-entry profiler: run one catalog entry under the bench protocol
(noop sink), attribute wall-clock to Spark jobs/stages via the UI REST
API, and print a per-job breakdown.

Usage:
    python scripts/profile_entry.py ENTRY [ENTRY...] [--passes 3]

For each entry: warm pass + timed passes (best-of like bench.py), then a
final instrumented pass inside its own job group whose jobs are listed
with duration, stage count, task count, and shuffle bytes, so the time
sinks (many tiny jobs vs one slow stage vs driver gaps) are visible.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chchfr_data_collection_spark.queries import catalog  # noqa: E402


def get_spark_with_ui():
    import os

    from pyspark.sql import SparkSession

    from chchfr_data_collection_spark import session as S

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def rest(app_id: str, path: str):
    url = f"http://localhost:4049/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark_with_ui()
    app_id = spark.sparkContext.applicationId
    cat = catalog()
    spark.range(1).count()

    for name in args:
        fn = cat[name].fn
        times = []
        for i in range(passes):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        # instrumented pass
        sc = spark.sparkContext
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        jobs_before = {j["jobId"] for j in rest(app_id, "/jobs")}
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        time.sleep(0.3)
        jobs = [j for j in rest(app_id, "/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        total_job_ms = 0.0
        print(f"\n=== {name}  passes={times}  instrumented_wall={wall:.3f}s "
              f"jobs={len(jobs)}")
        for j in jobs:
            t_sub = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            sub_ms = j["submissionTime"][20:23]
            t_done = time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            done_ms = j["completionTime"][20:23]
            dur = (t_done + int(done_ms) / 1000) - (t_sub + int(sub_ms) / 1000)
            total_job_ms += dur
            desc = (j.get("description") or j.get("name") or "")[:90]
            print(f"  job {j['jobId']:>4} {dur*1000:8.0f}ms tasks={j['numTasks']:<4} "
                  f"stages={len(j['stageIds'])} {desc}")
        print(f"  sum(job durations)={total_job_ms:.3f}s  "
              f"driver/gap={(wall - total_job_ms):.3f}s")


if __name__ == "__main__":
    main()
