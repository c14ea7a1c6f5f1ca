"""Interleaved A/B harness for the dedup_embedding_lsh(_auto) bisect
(round 14): usage `python tools/ab_embedding_lsh.py <repo_root>` -- run
alternating with a worktree of the comparison commit. Prints one
ABRESULT JSON line with warm+3 timed reps per query at sf0.1."""
import json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from hadoop_multiple_streaming_spark import workloads
from hadoop_multiple_streaming_spark.session import get_spark
workloads.load_all()
spark = get_spark(app_name="ab-lsh", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
# arrow pool pre-warm like bench.py
spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()
sf_dir = "/root/testdata/sf0.1"
out = {}
for name in ("dedup_embedding_lsh", "dedup_embedding_lsh_auto"):
    workloads.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    reps = []
    for _ in range(3):
        t0 = time.monotonic()
        workloads.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        reps.append(round(time.monotonic() - t0, 3))
    out[name] = reps
print("ABRESULT " + json.dumps({"repo": repo, **out}))
spark.stop()
