"""Measure write_training_shards at scale (round-11 verdict task #6).

The operator shipped in round 11 with sizing notes but no measured row.
This writes the sf4.0/sf8.0 documents corpora (200k/400k rows) as
deterministically shuffled fixed-size shards, times the end-to-end
write, and verifies the layout contract at scale:

  * every shard=<k>/ directory holds exactly ONE data file,
  * every shard holds exactly rows_per_shard rows (last one ragged),
  * the ordinals across all shards are a permutation of 0..n-1 and
    shard k covers exactly [k * rows_per_shard, ...) — contiguous.

    python tools/bench_shard_write.py [.localdata/sf4.0 .localdata/sf8.0]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        os.path.join(REPO, ".localdata", "sf4.0"),
        os.path.join(REPO, ".localdata", "sf8.0"),
    ]
    rows_per_shard = 25_000

    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.session import get_spark
    from hadoop_multiple_streaming_spark.sources.io import (
        write_training_shards,
    )

    spark = get_spark(
        app_name="shard-write-bench", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n = docs.count()
        out = f"/tmp/shards_{os.path.basename(sf_dir)}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.monotonic()
        write_training_shards(
            docs, out, "doc_id", rows_per_shard, seed=7, mode="overwrite"
        )
        wall = round(time.monotonic() - t0, 2)

        # layout contract
        shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
        n_shards = len(shard_dirs)
        want_shards = (n + rows_per_shard - 1) // rows_per_shard
        files_per_dir = {
            d: len(glob.glob(os.path.join(d, "*.parquet"))) for d in shard_dirs
        }
        one_file = all(v == 1 for v in files_per_dir.values())

        back = spark.read.parquet(out)
        per_shard = {
            r["shard"]: r["c"]
            for r in back.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        sizes_ok = all(
            per_shard[k] == (rows_per_shard if k < n_shards - 1 else n - rows_per_shard * (n_shards - 1))
            for k in per_shard
        )
        perm = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ordinal").alias("d"),
            F.min("ordinal").alias("mn"),
            F.max("ordinal").alias("mx"),
        ).collect()[0]
        perm_ok = perm["n"] == n and perm["d"] == n and perm["mn"] == 0 and perm["mx"] == n - 1
        contiguous = back.where(
            F.expr(f"ordinal div {rows_per_shard}") != F.col("shard")
        ).count() == 0
        out_mb = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
        ) / 1e6
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "rows": n,
                    "rows_per_shard": rows_per_shard,
                    "shards": n_shards,
                    "expected_shards": want_shards,
                    "one_file_per_dir": one_file,
                    "sizes_exact": sizes_ok,
                    "ordinals_permutation": bool(perm_ok),
                    "shards_contiguous": bool(contiguous),
                    "wall_sec": wall,
                    "rows_per_sec": round(n / wall),
                    "out_mb": round(out_mb, 1),
                }
            )
        )
        shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
