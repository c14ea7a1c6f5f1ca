"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is fully executed via the noop sink (all columns computed,
nothing collected to the driver). Use sf0.01/sf0.001 locally while
iterating:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# headline set: one per operator family (relational scan/agg, joins,
# window, pipe subprocess, aggregate family, fan-out, dedup, text,
# similarity). Keep in sync with workloads as families are added.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "events_hourly_rollup",
    "events_sessionize",
    "part_supplier_topn",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q21_sole_failing_supplier",
    "price_percentiles",
    "asof_click_attribution",
    "pipe_wordcount",
    "agg_long_sum",
    "agg_long_sum_native",  # twin: agg_long_sum minus the line codec
    "agg_value_histogram",
    "fanout_two_branches",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "text_quality_score",
    "curation_pipeline",
    "ann_cosine_topk",
    "orders_grouping_sets",
    "stratified_sample",
    # round-5 extension surface
    "pack_sequences_global",
    "text_boilerplate_removal",
    "text_pii_redact",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from hadoop_multiple_streaming_spark import workloads
    from hadoop_multiple_streaming_spark.session import get_spark

    workloads.load_all()
    spark = get_spark(
        app_name="hms-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in workloads.QUERIES]
    # warm IMMEDIATELY before timing each query (not one global warm
    # pass): the generated-class cache is shared across queries, and a
    # whole-catalog warm pass evicts the early queries' classes before
    # the timed pass reaches them — the "warm" run then re-pays
    # multi-second Janino compiles. Per-query warm+time keeps the
    # steady-state measurement honest (session.py also raises
    # spark.sql.codegen.cache.maxEntries as a second line of defense).
    times: dict[str, float] = {}
    for name in names:
        # warm pass (Janino compiles, shuffle init for the plan
        # shapes), then MIN of two timed runs: the host shares cores
        # with other tenants (idle load avg ~3), so a single timed run
        # regularly carries 2-3x transient-contention noise; min-of-2
        # is the standard robust steady-state estimator
        try:
            workloads.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.monotonic()
                df = workloads.QUERIES[name](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt = round(time.monotonic() - t0, 3)
                best = dt if best < 0 else min(best, dt)
            times[name] = best
        except Exception as e:
            print(f"[bench] {name} FAILED: {str(e)[:200]}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
