"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The query catalog lives in ``hadoop_multiple_streaming_spark.workloads``
(one module per operator family: relational, aggregates,
streaming-compat pipe/fan-out, dedup, text analysis, similarity);
this file just adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from hadoop_multiple_streaming_spark import workloads  # noqa: E402
from hadoop_multiple_streaming_spark.session import tune_session  # noqa: E402

workloads.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-style pricing summary (scan → pushed
    filter → partial+final hash aggregation) on sf0.001."""
    tune_session(spark)
    return workloads.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _staleness_order(names) -> list[str]:
    """Order query names by how long ago each was last hash-green in a
    driver correctness window (CORRECTNESS_r*.json), STALEST FIRST —
    so a bounded per-round window naturally re-anchors the catalog's
    oldest greens instead of re-checking last round's (VERDICT r14
    task 5). Never-green (new) queries sort first of all. Falls back
    to registry order if the history can't be read."""
    import glob
    import json
    import re as _re

    latest: dict[str, int] = {}
    try:
        for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
            m = _re.search(r"_r(\d+)\.json$", f)
            if not m:
                continue
            rnd = int(m.group(1))
            with open(f) as fh:
                data = json.load(fh)
            if not isinstance(data, dict):
                continue
            for q, v in data.items():
                if isinstance(v, dict) and v.get("hash_match"):
                    latest[q] = max(latest.get(q, 0), rnd)
    except Exception:
        return list(names)
    return sorted(names, key=lambda q: (latest.get(q, 0), q))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline extensions), stalest-green first so a
    bounded correctness window rotates through the whole catalog."""
    order = _staleness_order(workloads.QUERIES)
    return {name: workloads.QUERIES[name] for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same output column names; the
    few non-SQL-expressible ops are simply absent here → rows-only
    check)."""
    return dict(workloads.ORACLES)
