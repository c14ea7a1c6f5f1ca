"""Queries that exercise the reference's signature machinery end to
end: the subprocess pipe operator (P1/P2), splitKeyVal line semantics,
whole-sorted-partition reducer feeding (G1), and the N-branch fan-out
over one scan (F1/F3) — each with a DuckDB oracle over the same
parquet tables."""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.kv import join_key_val, split_key_val
from ..operators.pipe import pipe_map, pipe_reduce
from ..plans.model import Branch, JobSpec
from ..plans.runner import plan_branches
from . import register
from .tables import load

_SCRIPTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")


def _script(name: str) -> list[str]:
    return [sys.executable, os.path.join(_SCRIPTS, name)]


@register(
    "pipe_wordcount",
    oracle="""
    SELECT word AS key, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical streaming job through the REAL subprocess path:
    text -> pipe mapper (word\\t1) -> repartition+sortWithinPartitions
    by key -> pipe reducer (streaming sum over the sorted partition) —
    reference P1+G1+P2 in one query (README.md:8-11's WC branch).

    Pipe parallelism == partition count (one subprocess per
    partition; the docs parquet is a single small file -> one
    partition -> one subprocess without the repartition, while a
    100 TB scan already yields enough partitions). r16 (VERDICT task
    7): both counts derive from the session instead of the 16/8
    literals tuned for neither local mode nor a cluster. The width is
    ``defaultParallelism // 2`` because every pipe partition occupies
    TWO schedulable units — the JVM feeder task and its child
    subprocess — so cores/2 lanes saturate the host without
    oversubscribing (interleaved A/B at sf0.1 on local[32]: 16/16
    lanes 0.83 s, 16/8 0.86, 8/8 0.88, 32/32 1.15). Results are
    partition-count invariant: the shuffle is BY KEY, so every key's
    lines land in one reducer subprocess at any count."""
    lanes = max(1, spark.sparkContext.defaultParallelism // 2)
    docs = (
        load(spark, sf_dir, "documents")
        .select(F.col("text").alias("line"))
        .repartition(lanes)
    )
    kv = pipe_map(docs, _script("wc_map.py"))
    out = pipe_reduce(kv, _script("wc_red.py"), num_partitions=lanes)
    return out.select("key", F.col("value").cast("long").alias("cnt"))


@register(
    "pipe_identity_cat",
    oracle="""
    SELECT lang AS key, COUNT(*) AS cnt FROM documents GROUP BY lang
    """,
)
def pipe_identity_cat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`cat` identity pipe (the reference hardcodes `cat` as the
    phase-2 mapper, RedStreamJob.java:728-733): kv lines round-trip
    through a real subprocess and splitKeyVal, then a native count."""
    docs = load(spark, sf_dir, "documents").select(
        join_key_val(F.col("lang"), F.col("doc_id").cast("string")).alias("line")
    )
    kv = pipe_map(docs, "cat")
    return kv.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "fanout_two_branches",
    oracle="""
    SELECT 'TOKENS' AS branch, word AS key, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
    WHERE word <> '' GROUP BY word
    UNION ALL
    SELECT 'LANGS' AS branch, lang AS key, COUNT(*) AS cnt
    FROM documents GROUP BY lang
    """,
)
def fanout_two_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's raison d'être (F1): ONE input scan feeding N
    branch pipelines. Two native branches (F3's in-JVM branch flavor)
    over `lang\\ttext` lines; plan_branches builds both lineages from
    the shared scan. share_mode='none' because the input is columnar
    and each branch prunes its own columns."""

    def tokens_mapper(lines: DataFrame) -> DataFrame:
        _, text = split_key_val(F.col("line"))
        return (
            lines.select(F.explode(F.split(text, " ")).alias("key"))
            .where(F.col("key") != "")
            .withColumn("value", F.lit("1"))
        )

    def count_reducer(kv: DataFrame) -> DataFrame:
        return kv.groupBy("key").agg(F.count(F.lit(1)).cast("string").alias("value"))

    def langs_mapper(lines: DataFrame) -> DataFrame:
        lang, _ = split_key_val(F.col("line"))
        return lines.select(lang.alias("key"), F.lit("").alias("value"))

    spec = JobSpec(
        inputs=[f"{sf_dir}/documents.parquet"],
        output="/tmp/hms_unused",
        branches=[
            Branch("TOKENS", mapper=tokens_mapper, reducer=count_reducer),
            Branch("LANGS", mapper=langs_mapper, reducer=count_reducer),
        ],
        input_format="parquet",
        input_columns=["lang", "text"],
        share_mode="none",
    )
    plans = plan_branches(spark, spec)
    tagged = [
        df.select(F.lit(key).alias("branch"), "key", F.col("value").cast("long").alias("cnt"))
        for key, df in plans.items()
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


@register(
    "pipe_grouped_reduce",
    oracle="""
    SELECT lang AS key,
           CAST(COUNT(*) AS VARCHAR) || ',' ||
           MIN(CAST(doc_id AS VARCHAR)) || ',' ||
           MAX(CAST(doc_id AS VARCHAR)) AS value
    FROM (SELECT lang, lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id
          FROM documents) t
    GROUP BY lang
    """,
)
def pipe_grouped_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2's per-group isolation flavor (grouped_pipe_reduce /
    applyInPandas): one subprocess invocation per key, fed only that
    key's value-sorted lines — a stateful reducer (count + first/last
    value) restarts per key by construction. doc_ids are zero-padded
    so the subprocess's string sort order == the oracle's MIN/MAX."""
    from ..operators.pipe import grouped_pipe_reduce

    docs = load(spark, sf_dir, "documents").select(
        F.col("lang").alias("key"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("value"),
    )
    return grouped_pipe_reduce(docs, _script("group_stats.py"))
