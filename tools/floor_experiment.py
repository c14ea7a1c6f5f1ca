"""Floor-reduction experiment (VERDICT r10 item 7): the sf0.1 bench's
~0.5-1.3 s per-query floor on trivia queries (agg_long_sum,
agg_value_histogram, pack_sequences_global) is most of the 5x-vs-DuckDB
aggregate gap. Is any of it conf-reducible, or is it scheduler-
irreducible?

Variants, each applied as RUNTIME conf in one long-lived session (so
session startup / codegen cache warmup are excluded — this isolates
the per-query floor):

  baseline      bench defaults (AQE on, shuffle.partitions=32)
  aqe_off       spark.sql.adaptive.enabled=false — AQE materializes
                every exchange as a separate job with a driver
                round-trip re-plan; on sub-second queries that barrier
                may BE the floor
  shuffle8      spark.sql.shuffle.partitions=8 — 4x fewer reduce tasks
                to dispatch (AQE coalesces post-hoc but initial task
                launch count still follows this)
  aqe_off_sh8   both

Each variant runs QUERIES x REPS, reports per-query min (min-of-runs
is the host-noise policy, DEPLOY.md). Queries are fully executed via
the noop sink like bench.py.

Usage: python tools/floor_experiment.py [reps=5]
Writes tools/floor_experiment.json + a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["agg_long_sum", "agg_long_sum_native", "agg_value_histogram", "pack_sequences_global"]

VARIANTS = {
    "baseline": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "shuffle8": {"spark.sql.shuffle.partitions": "8"},
    "aqe_off_sh8": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    },
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from hadoop_multiple_streaming_spark import workloads
    from hadoop_multiple_streaming_spark.session import get_spark

    workloads.load_all()
    spark = get_spark(
        app_name="hms-floor-exp", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {k: spark.conf.get(k) for v in VARIANTS.values() for k in v}

    def run_query(name: str) -> float:
        t0 = time.monotonic()
        df = workloads.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # warmup: touch each query once (codegen cache, file listing)
    for q in QUERIES:
        run_query(q)

    results: dict[str, dict[str, float]] = {}
    # interleave variants per rep so drift hits each equally
    raw: dict[str, dict[str, list[float]]] = {
        v: {q: [] for q in QUERIES} for v in VARIANTS
    }
    for rep in range(reps):
        for vname, conf in VARIANTS.items():
            for k, val in conf.items():
                spark.conf.set(k, val)
            try:
                for q in QUERIES:
                    raw[vname][q].append(run_query(q))
            finally:
                for k in conf:
                    spark.conf.set(k, defaults[k])
        print(f"[floor] rep {rep} done", flush=True)

    for vname in VARIANTS:
        results[vname] = {q: round(min(raw[vname][q]), 3) for q in QUERIES}
        results[vname]["_total"] = round(sum(results[vname][q] for q in QUERIES), 3)

    hdr = "| variant | " + " | ".join(QUERIES) + " | total |"
    sep = "|" + "---|" * (len(QUERIES) + 2)
    lines = [hdr, sep]
    for vname in VARIANTS:
        r = results[vname]
        lines.append(
            f"| {vname} | "
            + " | ".join(f"{r[q]:.3f}" for q in QUERIES)
            + f" | {r['_total']:.3f} |"
        )
    md = "\n".join(lines)
    print(md)
    with open(os.path.join(REPO, "tools", "floor_experiment.json"), "w") as f:
        json.dump({"results": results, "raw": raw, "table_md": md, "reps": reps}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
