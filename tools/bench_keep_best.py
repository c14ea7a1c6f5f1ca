"""Measure keep_best_representative's aggregate plan vs the window
strawman on a mega-cluster-skewed corpus.

The operator's docstring claims the lexicographic max_by AGGREGATE
beats a row_number window when one cluster holds a large share of the
corpus (the boilerplate mega-cluster every web crawl has): the agg's
per-cluster state is one (score, id) pair and partial-aggregates
map-side, while the window materializes and sorts every member of the
dominant cluster inside ONE partition. This script builds a synthetic
corpus (one cluster = 50% of rows, the rest in clusters of ~10), times
both plans, and verifies they pick the identical representatives.

    python tools/bench_keep_best.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.operators.corpus import (
        keep_best_representative,
    )
    from hadoop_multiple_streaming_spark.session import get_spark

    spark = get_spark(
        app_name="keep-best-bench", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 50% of rows share ONE cluster key ('mega'); the rest land in
    # clusters of ~10 members
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, F.lit("mega"))
            .otherwise(F.concat(F.lit("c"), (F.col("id") / 20).cast("long")))
            .alias("h"),
            F.pmod(F.xxhash64("id"), F.lit(100000)).alias("score"),
        )
        .persist()
    )
    df.count()

    def timed(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return round(best, 2)

    agg = keep_best_representative(df, ["h"], "id", "score")
    w = Window.partitionBy("h").orderBy(F.desc("score"), F.asc("id"))
    win = (
        df.select(
            "h",
            "id",
            "score",
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy("h")).alias("dup_cnt"),
        )
        .where(F.col("_rn") == 1)
        .select(
            "h",
            F.col("id").alias("keep_id"),
            F.col("score").alias("keep_score"),
            "dup_cnt",
        )
    )

    t_agg = timed(lambda: agg.write.format("noop").mode("overwrite").save())
    t_win = timed(lambda: win.write.format("noop").mode("overwrite").save())

    # answer equality (order-insensitive)
    mism = agg.join(win, ["h", "keep_id", "keep_score", "dup_cnt"], "full_outer")
    same = (
        agg.count() == win.count()
        and mism.count() == agg.count()
    )
    print(
        json.dumps(
            {
                "n_rows": n,
                "mega_cluster_share": 0.5,
                "agg_sec": t_agg,
                "window_sec": t_win,
                "speedup": round(t_win / t_agg, 2) if t_agg else None,
                "identical_answers": bool(same),
            }
        )
    )
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
