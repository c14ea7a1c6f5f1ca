"""Engine-vs-engine sanity bench (BASELINE.md M5 row): demonstrate
single-scan sharing by timing N-branch fan-out jobs for N in {1,2,4,8}
over sf0.1 lineitem serialized to text, with `cat` subprocess branches.

Claim under test (derived from the reference's architecture,
MultiPipeMapper.java:150-169): an N-branch run should cost roughly
one scan + N branch transforms — NOT N full scans. We time
share_mode='persist' (scan cached once) against share_mode='none'
(every branch re-reads) and print one JSON line.

    python tools/bench_fanout.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.functions.kv import to_lines
    from hadoop_multiple_streaming_spark.plans.model import Branch, JobSpec
    from hadoop_multiple_streaming_spark.plans.runner import run_job
    from hadoop_multiple_streaming_spark.session import get_spark

    spark = get_spark(
        app_name="hms-fanout-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the text input once (lineitem serialized tab-KV,
    # replicated 6x so the scan+parse is the dominant cost)
    workdir = "/tmp/hms_fanout_bench"
    shutil.rmtree(workdir, ignore_errors=True)
    text_in = f"{workdir}/input"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )
    lines = to_lines(li, "\t")
    big = lines
    for _ in range(5):
        big = big.unionByName(lines)
    big.repartition(int(cpus)).write.text(text_in)

    def selective_mapper(i: int):
        # cheap, selective native branch: scan dominates, branch output
        # is tiny — the shape where single-scan sharing pays off
        def mapper(df):
            key, value = F.col("line"), F.lit("")
            return (
                df.where(F.col("line").endswith(str(i)))
                .where(F.length("line") % 97 == i % 97)
                .select(key.alias("key"), value.alias("value"))
            )

        return mapper

    def run(n_branches: int, share_mode: str, pipe: bool = False) -> float:
        out = f"{workdir}/out_{share_mode}_{n_branches}_{int(pipe)}"
        spec = JobSpec(
            inputs=[text_in],
            output=out,
            branches=[
                Branch(f"B{i}", mapper="cat" if pipe else selective_mapper(i), reducer=None)
                for i in range(n_branches)
            ],
            share_mode=share_mode,
            overwrite=True,
        )
        t0 = time.monotonic()
        result = run_job(spark, spec)
        dt = time.monotonic() - t0
        assert result.succeeded, [r.error for r in result.results]
        return round(dt, 3)

    run(1, "persist")  # warm codegen + page cache

    timings: dict[str, dict[str, float]] = {"persist": {}, "none": {}}
    for n in (1, 2, 4, 8):
        timings["persist"][str(n)] = run(n, "persist")
    for n in (1, 2, 4, 8):
        timings["none"][str(n)] = run(n, "none")
    # pipe-branch variant: subprocess cost dominates, so N-linear growth
    # is expected REGARDLESS of sharing (the scan is not the bottleneck
    # locally; at 100 TB on real storage it is). r14: INTERLEAVED
    # 1-branch control vs 8 branches, min-of-3 — the r13 contended
    # samples (18.0/60.9 s) showed a lone 8-branch number can't be
    # read without a same-minute control next to it.
    pipe1, pipe8 = [], []
    run(1, "persist", pipe=True)  # warm the subprocess path
    for _ in range(3):
        pipe1.append(run(1, "persist", pipe=True))
        pipe8.append(run(8, "persist", pipe=True))
    pipe_timings = {
        "persist_1": min(pipe1),
        "persist_8": min(pipe8),
        "reps_1": pipe1,
        "reps_8": pipe8,
    }

    p1, p8 = timings["persist"]["1"], timings["persist"]["8"]
    n1, n8 = timings["none"]["1"], timings["none"]["8"]
    print(
        json.dumps(
            {
                "metric": "fanout_scaling",
                "unit": "sec",
                "timings": timings,
                "pipe_branches": pipe_timings,
                "persist_ratio_8x": round(p8 / p1, 2),
                "rescan_ratio_8x": round(n8 / n1, 2),
                "note": "selective native branches: persist[8]/persist[1] "
                "near 1 shows single-scan sharing; none re-scans per branch",
            }
        )
    )
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
