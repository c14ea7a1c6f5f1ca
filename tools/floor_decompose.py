"""Decompose the sf0.1 per-query floor (opt round r15): how much of a
floor-bound bench rep is (a) Python-side query CONSTRUCTION — plan
building, spark.read.parquet file listing + footer schema reads — vs
(b) the actual noop-sink EXECUTION of a pre-built DataFrame, vs (c)
the irreducible action floor (noop write of spark.range(1)).

The bench times construction + execution together (one rep =
QUERIES[name](spark, sf_dir) then .write.format("noop")), so any
construction fat is pure floor tax paid by EVERY query in the set.

Usage: python tools/floor_decompose.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "agg_long_sum_native",
    "agg_long_sum",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q3_shipping_priority",
    "price_percentiles",
    "pipe_wordcount",
    "salted_join_revenue",
    "temperature_sample",
    "events_hourly_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from hadoop_multiple_streaming_spark import workloads
    from hadoop_multiple_streaming_spark.session import get_spark

    workloads.load_all()
    spark = get_spark(
        app_name="floor-decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or DEFAULT

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # warm the Arrow pool like bench.py does
    spark.range(int(cpus), numPartitions=int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    # (c) irreducible action floor
    noop(spark.range(1))
    floor = min(
        (lambda t0: (noop(spark.range(1)), time.monotonic() - t0)[1])(time.monotonic())
        for _ in range(5)
    )
    print(f"range(1) noop floor: {floor*1000:.0f} ms")

    out = {}
    for name in names:
        fn = workloads.QUERIES[name]
        # warm
        try:
            noop(fn(spark, sf_dir))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}")
            continue
        cons, execs, full = [], [], []
        for _ in range(3):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            noop(df)
            t2 = time.monotonic()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            full.append(t2 - t0)
        out[name] = {
            "construct_ms": round(min(cons) * 1000),
            "exec_ms": round(min(execs) * 1000),
            "full_ms": round(min(full) * 1000),
        }
        print(
            f"{name:32s} construct {min(cons)*1000:6.0f} ms   "
            f"exec {min(execs)*1000:6.0f} ms   full {min(full)*1000:6.0f} ms"
        )
    with open(os.path.join(REPO, "tools", "floor_decompose.json"), "w") as fh:
        json.dump({"floor_ms": round(floor * 1000), "queries": out}, fh, indent=1)


if __name__ == "__main__":
    main()
