"""SQL entry surface: register the engine's tables as temp views so
users run plain ``spark.sql(...)`` against them — the declarative twin
of the DataFrame workloads (Catalyst plans both identically).

    from hadoop_multiple_streaming_spark.sql import register_tables
    register_tables(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .workloads.tables import TABLES, load


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Create (or replace) a temp view per test table. Views are lazy —
    registering costs nothing; filters/projections in subsequent SQL
    still push into the parquet scans."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str):
    """One-shot convenience: register views and run a query."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
