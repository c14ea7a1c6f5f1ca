"""Throughput bench for the streaming incremental-MinHash ingest
screen (streaming.fanout.streaming_incremental_minhash) — the 100 TB
ingest story: docs/sec over a multi-batch replay of the documents
table, with the persisted bucket store GROWING batch over batch (so
the measured cost includes the store probe + store append, not just
the banding math).

Method: the documents table is split into ``--batches`` equal hash
partitions, each staged as one parquet file; a file-source stream with
maxFilesPerTrigger=1 + Trigger.AvailableNow replays them as that many
micro-batches through the real foreachBatch screen (checkpoint, store
probe, survivor write, store append — everything the production path
pays). Wall-clock covers the full run; per-batch durations come from
the query's progress events.

    python tools/bench_streaming.py [sf_dir] [--batches N]

Prints one JSON line:
  {"metric": "streaming_minhash_docs_per_sec", "value": ..., ...}
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
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=10)
    ns = ap.parse_args()
    sf_dir, n_batches = ns.sf_dir, ns.batches
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.session import get_spark
    from hadoop_multiple_streaming_spark.streaming.fanout import (
        streaming_incremental_minhash,
    )

    spark = get_spark(
        app_name="hms-streaming-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = "/tmp/hms_streaming_bench"
    shutil.rmtree(workdir, ignore_errors=True)
    indir = f"{workdir}/in"
    os.makedirs(indir)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    # stage batches one file each, in order, so the file source replays
    # them as ordered micro-batches (mod-split ~= arrival sharding)
    for b in range(n_batches):
        docs.where(F.col("doc_id") % n_batches == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{workdir}/stage{b}")
        part = [
            f
            for f in os.listdir(f"{workdir}/stage{b}")
            if f.endswith(".parquet")
        ][0]
        shutil.move(f"{workdir}/stage{b}/{part}", f"{indir}/batch{b:04d}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    t0 = time.monotonic()
    q = streaming_incremental_minhash(
        stream,
        f"{workdir}/store",
        f"{workdir}/out",
        f"{workdir}/ckpt",
        available_now=True,
    )
    q.awaitTermination(1800)
    wall = time.monotonic() - t0

    survivors = spark.read.parquet(f"{workdir}/out").count()
    store_keys = spark.read.parquet(f"{workdir}/store").count()
    batch_ms = [
        p["durationMs"].get("triggerExecution", -1)
        for p in (
            json.loads(x if isinstance(x, str) else x.json)
            for x in q.recentProgress
        )
        if p.get("numInputRows", 0) > 0
    ]
    rec = {
        "metric": "streaming_minhash_docs_per_sec",
        "value": round(n_docs / wall, 1),
        "unit": "docs/sec",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_batches": n_batches,
        "wall_sec": round(wall, 2),
        "survivors": survivors,
        "store_keys": store_keys,
        # steady-state = per-batch cost once the store is warm (last
        # vs first batch shows the store-growth penalty, if any)
        "batch_ms_first": batch_ms[0] if batch_ms else -1,
        "batch_ms_last": batch_ms[-1] if batch_ms else -1,
        "batch_ms_all": batch_ms,
    }
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
