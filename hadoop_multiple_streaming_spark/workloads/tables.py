"""Test-table loaders (TESTDATA.md: TPC-H-ish star schema + events +
documents + embeddings, one parquet per table)."""

from __future__ import annotations

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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — keep the projection/filter in the caller so
    Catalyst pushes them into this scan.

    events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as a long (legacy conf) and rebuild a
    microsecond timestamp (same truncation DuckDB applies when it
    lowers TIMESTAMP_NS into micros-based functions)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the rebuilt ts is a TZ-aware timestamp; date_format/date_trunc
        # on it follow the session timezone, so pin UTC here — the
        # driver's session may not have been built by our factory
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
