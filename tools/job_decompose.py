"""Per-job decomposition of a catalog query: run it once warm, once
timed, and print every Spark job the timed run submitted (duration,
stage count, task count, name) from the UI REST API — guide §1
"measure first" for multi-job queries (sampler construction collects,
Lloyd iterations, index training), where explain() shows only the
final action's plan and the wall-clock hides the job stacking.

    python tools/job_decompose.py QUERY [QUERY ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from hadoop_multiple_streaming_spark import workloads
    from hadoop_multiple_streaming_spark.session import get_spark

    workloads.load_all()
    spark = get_spark(
        app_name="hms-spark-job-decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # pool pre-warm as in bench.py
    spark.range(int(cpus), numPartitions=int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    for name in names:
        fn = workloads.QUERIES[name]
        # warm (codegen, training caches)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        before = {j["jobId"] for j in _api(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.monotonic()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        tot = 0.0
        for j in jobs:
            t_sub = j.get("submissionTime", "")
            t_done = j.get("completionTime", "")
            dur = None
            try:
                from datetime import datetime

                f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(t_done.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    - datetime.strptime(t_sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                ).total_seconds()
                tot += dur
            except Exception:
                pass
            print(
                f"  job {j['jobId']:>4} {dur if dur is not None else '?':>7}s "
                f"stages={len(j.get('stageIds', []))} tasks={j.get('numTasks', '?')} "
                f"desc={str(j.get('description') or j.get('name'))[:90]}"
            )
        print(f"  sum of job durations: {tot:.3f}s (gaps = driver-side time)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
