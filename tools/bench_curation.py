"""Curation capstone bench (DEPLOY.md row): the COMPOSED pipeline —
quality scoring -> threshold filter -> exact dedup -> split -> stats
(workloads.text.curation_pipeline) — end-to-end at sf2.0 on both
engines, plus per-stage cumulative timings, to show the composition
amortizes the per-query Spark stage floor the way the per-family
crossover curves do: one scan feeds every stage, so the pipeline costs
~one family query, not four.

Stages (each timed as a materialized prefix of the same plan):
  kept = quality features + threshold filter   (scan + projection)
  rep  = exact dedup representatives           (+ groupBy(md5(text)))
  full = split assignment + (split, lang) stats (+ final rollup)

Same estimator as bench_crossover: warm pass then min of two timed
runs; Spark executes to the noop sink, DuckDB fetchall()s.

    python tools/bench_curation.py [sf_dir ...]
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


def _stage_dfs(spark, sf_dir):
    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.functions.sampling import assign_split
    from hadoop_multiple_streaming_spark.functions.textanalysis import (
        quality_features,
    )
    from hadoop_multiple_streaming_spark.workloads.tables import load

    docs = load(spark, sf_dir, "documents")
    scored = quality_features(docs, "text").select(
        "doc_id", "lang", "text", "n_words", "quality_score"
    )
    kept = scored.where(
        (F.col("quality_score") >= 0.3) & (F.col("n_words") >= 50)
    )
    rep = kept.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.expr("min_by(n_words, doc_id)").alias("n_words"),
    )
    full = (
        rep.select(
            assign_split(
                "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
            ).alias("split"),
            "lang",
            "n_words",
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_tokens"),
        )
    )
    return {
        # same output columns as the oracle stage (text stays inside
        # the plan on both engines, never in the materialized result)
        "kept": kept.select(
            "doc_id", "lang", "n_words", F.col("quality_score").alias("q")
        ),
        "rep": rep.select("doc_id", "lang", "n_words"),
        "full": full,
    }


def _time_spark(df) -> float:
    df.write.mode("overwrite").format("noop").save()
    best = -1.0
    for _ in range(2):
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        best = dt if best < 0 else min(best, dt)
    return round(best, 3)


def _time_duck(con, sql: str) -> float:
    con.execute(sql).fetchall()
    best = -1.0
    for _ in range(2):
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        dt = time.monotonic() - t0
        best = dt if best < 0 else min(best, dt)
    return round(best, 3)


def main() -> int:
    sf_dirs = sys.argv[1:] or [os.path.join(REPO, ".localdata", "sf2.0")]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hadoop_multiple_streaming_spark.session import get_spark
    from hadoop_multiple_streaming_spark.workloads.text import _curation_oracle

    spark = get_spark(
        app_name="hms-curation-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for sf_dir in sf_dirs:
        m = re.search(r"sf([0-9.]+)", sf_dir)
        sf = float(m.group(1)) if m else -1.0
        con = duckdb.connect()
        con.execute(f"SET threads TO {cpus}")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        dfs = _stage_dfs(spark, sf_dir)
        for stage in ("kept", "rep", "full"):
            s = _time_spark(dfs[stage])
            d = _time_duck(con, _curation_oracle(stage))
            rec = {
                "sf": sf,
                "stage": stage,
                "spark_sec": s,
                "duckdb_sec": d,
                "ratio": round(s / d, 2) if d > 0 else -1.0,
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
        con.close()

    print("\n| stage | sf | spark (s) | duckdb (s) | ratio |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['stage']} | {r['sf']} | {r['spark_sec']} "
            f"| {r['duckdb_sec']} | {r['ratio']}x |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
