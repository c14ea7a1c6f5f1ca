"""Interleaved pipe fan-out A/B: python tools/ab_fanout.py <repo_root>.
Times 1-branch and 8-branch `cat` pipe fan-out (persist share mode),
warm + 2 reps each, one fresh session per invocation."""
import json, shutil, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from pyspark.sql import functions as F
from hadoop_multiple_streaming_spark.plans.model import Branch, JobSpec
from hadoop_multiple_streaming_spark.plans.runner import run_job
from hadoop_multiple_streaming_spark.session import get_spark
from hadoop_multiple_streaming_spark.functions.kv import to_lines

spark = get_spark(app_name="ab-fanout", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
workdir = "/tmp/hms_ab_fanout"
shutil.rmtree(workdir, ignore_errors=True)
text_in = f"{workdir}/input"
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
    "l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
lines = to_lines(li, "\t")
big = lines
for _ in range(5):
    big = big.unionByName(lines)
big.repartition(32).write.text(text_in)

def run(n):
    out = f"{workdir}/out_{n}"
    spec = JobSpec(inputs=[text_in], output=out,
                   branches=[Branch(f"B{i}", mapper="cat", reducer=None) for i in range(n)],
                   share_mode="persist", overwrite=True)
    t0 = time.monotonic()
    r = run_job(spark, spec)
    assert r.succeeded
    return round(time.monotonic() - t0, 3)

run(1)  # warm
r1, r8 = [], []
for _ in range(2):
    r1.append(run(1))
    r8.append(run(8))
print("ABFAN " + json.dumps({"repo": repo, "pipe1": r1, "pipe8": r8}))
spark.stop()
