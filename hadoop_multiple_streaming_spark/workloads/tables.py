"""Test-table loaders (TESTDATA.md: TPC-H-ish star schema + events +
documents + embeddings, one parquet per table)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a session-TZ TIMESTAMP regardless of how
    the generator wrote it. Seen in the wild: TIMESTAMP(NANOS) (read as
    long nanos under the legacy conf), plain TIMESTAMP(MICROS) read as
    TIMESTAMP_NTZ, or already a TZ-aware TIMESTAMP. Downstream queries
    date_format/date_trunc under a UTC session, so all three normalize
    to the same wall-clock values DuckDB sees."""
    t = dict(df.dtypes).get("ts")
    if t == "bigint":  # legacy nanos-as-long
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if t == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: per-process BASE-RELATION cache, keyed (app id, sf_dir, table,
#: path mtime). ``spark.read.parquet(path)`` pays a fresh driver-side
#: file listing + footer schema read + analysis round-trip on EVERY
#: call — 80-500 ms per query construction at sf0.1 (measured,
#: tools/floor_decompose.py), pure metadata work re-done per bench
#: rep. Caching the LAZY DataFrame handle is the same thing Spark's
#: own catalog does for tables (InMemoryFileIndex reuse; guide §6
#: filesourcePartitionFileCacheSize): no rows are cached, every
#: execution still scans the parquet. The mtime in the key makes a
#: rewritten path (tests regenerate fixture dirs) read fresh.
_DF_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — keep the projection/filter in the caller so
    Catalyst pushes them into this scan."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None  # non-local path (hdfs/s3 URI) — no cheap stat; don't cache
    key = (spark.sparkContext.applicationId, sf_dir, name, mtime)
    df = _DF_CACHE.get(key) if mtime is not None else None
    if df is not None:
        return df
    if name == "events":
        # tolerate nanos-precision generators (vectorized reader rejects
        # TIMESTAMP(NANOS) without this; harmless for micros files)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # date_format/date_trunc follow the session timezone; pin UTC —
        # the driver's session may not have been built by our factory
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = normalize_events_ts(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    if mtime is not None:
        _DF_CACHE[key] = df
    return df


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a starved LOCAL-MODE scan across the
    session's cores.

    The sf test tables are ONE parquet file with ONE row group, so a
    scan yields 1-2 input splits and any per-row kernel downstream
    (md5 shingling, Arrow embedding math) runs on 1-2 cores. This
    spreads it to ``defaultParallelism`` — derived from the session
    (local[$SPARK_GRAFT_CPUS] → that core count) rather than a
    constant tuned for local[32] (r15 opt: was a literal
    ``repartition(32)`` at every site, which the driver's
    lower-core-count bench would have paid 4x task overhead for).

    r16 (ADVICE #1): applied in LOCAL masters only. On a cluster a
    real multi-file corpus scan already yields >= cores partitions —
    the unconditional round-robin added a full shuffle of the corpus
    for nothing, and under dynamic allocation ``defaultParallelism``
    at plan-construction time can be far below the eventual
    executor-core total (e.g. 2 before executors register), actively
    SHRINKING scan parallelism. A cluster job stuck with one giant
    unsplittable file should repartition explicitly at the read
    (guide §2.5 input skew), not through this local-floor helper.
    Results are partition-count invariant at every call site
    (hash-deterministic per-row kernels and groupBy folds; seeds pick
    by ORDER BY md5(id), never by partition order), so the two modes
    return identical rows.
    """
    sc = df.sparkSession.sparkContext
    if not sc.master.startswith("local"):
        return df
    return df.repartition(sc.defaultParallelism)


#: per-process table-row-count cache, keyed (sf_dir, table, mtime).
#: The self-sizing workloads (auto LSH geometry, containment partition
#: pin, bloom gate) read a table's count at query CONSTRUCTION; the
#: count is a pure function of the parquet under sf_dir. r15
#: (optimization, guide §6): for a local single-file table the count
#: comes from the parquet FOOTER metadata (~1 ms, zero jobs — the same
#: footer statistic DuckDB answers COUNT(*) from), so even the first
#: rep pays no sizing job; directories / remote URIs fall back to the
#: count() job. The mtime key makes a rewritten path read fresh.
_COUNT_CACHE: dict = {}


def table_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    key = (sf_dir, name, mtime)
    n = _COUNT_CACHE.get(key)
    if n is None:
        if mtime is not None and os.path.isfile(path):
            try:
                import pyarrow.parquet as pq

                n = int(pq.ParquetFile(path).metadata.num_rows)
            except Exception:
                n = None
        if n is None:
            n = load(spark, sf_dir, name).count()
        _COUNT_CACHE[key] = n
    return n
