"""Spark-vs-DuckDB scaling curve for the two dedup "floor" queries.

DEPLOY.md decomposes dedup_minhash_lsh / dedup_ngram_jaccard into a
~1.4 s Spark constant (scheduling + codegen across 4-6 stages) plus a
marginal cost at or below DuckDB's; this tool measures both engines at
several scale factors to show the predicted crossover (ratio <= 2x once
work dominates the constant). Same estimator on both sides as
bench.py / tools/bench_baseline.py: warm pass, then min of two timed
runs; Spark executes to the noop sink, DuckDB fetchall()s.

    python tools/gen_scaled_docs.py 0.5 1.0        # once
    python tools/bench_crossover.py /root/testdata/sf0.01 \
        /root/testdata/sf0.1 .localdata/sf0.5 .localdata/sf1.0

Prints one JSON line per (sf, query, engine) and a final summary table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["dedup_minhash_lsh", "dedup_ngram_jaccard"]
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def time_spark(spark, fn, sf_dir: str) -> float:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    best = -1.0
    for _ in range(2):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        best = dt if best < 0 else min(best, dt)
    return round(best, 3)


def time_duck(con, sql: str) -> float:
    con.execute(sql).fetchall()  # warm
    best = -1.0
    for _ in range(2):
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        dt = time.monotonic() - t0
        best = dt if best < 0 else min(best, dt)
    return round(best, 3)


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".localdata", "sf0.5"),
        os.path.join(REPO, ".localdata", "sf1.0"),
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hadoop_multiple_streaming_spark import workloads
    from hadoop_multiple_streaming_spark.session import get_spark

    workloads.load_all()
    spark = get_spark(
        app_name="hms-crossover",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for sf_dir in sf_dirs:
        sf = _sf(sf_dir)
        con = duckdb.connect()
        con.execute(f"SET threads TO {cpus}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in QUERIES:
            s = time_spark(spark, workloads.QUERIES[name], sf_dir)
            d = time_duck(con, workloads.ORACLES[name])
            ratio = round(s / d, 2) if d > 0 else -1.0
            rec = {
                "sf": sf,
                "query": name,
                "spark_sec": s,
                "duckdb_sec": d,
                "ratio": ratio,
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
        con.close()

    print("\n| query | sf | spark (s) | duckdb (s) | ratio |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['sf']} | {r['spark_sec']} "
            f"| {r['duckdb_sec']} | {r['ratio']}x |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
