"""The Hadoop Streaming ``aggregate`` reducer family, DataFrame-native.

``-reducer aggregate`` in the reference installs ValueAggregatorReducer
+ combiner (RedStreamJob.java:747-749): the mapper emits
``AggType:key \\t value`` lines and the framework aggregates per key
(SURVEY §2.5). Here each aggregator is a native Spark aggregation —
Catalyst's partial/final hash aggregation replaces the combiner (G4)
for free, so map-side combine happens automatically.

Supported (same menu as hadoop mapred.lib.aggregate):
  LongValueSum DoubleValueSum LongValueMax LongValueMin
  StringValueMax StringValueMin UniqValueCount ValueHistogram

Malformed descriptors fail loudly (Hadoop's ValueAggregator path throws
on an unknown aggregator type rather than dropping records): a key
without an ``AggType:`` prefix or with an unrecognized type raises at
execution time via ``raise_error`` unless ``strict=False``.

Scale notes: one shuffle for all scalar aggregators (single
groupBy with conditional aggregates); ValueHistogram adds its own
two-level aggregation (distinct-value counts then moments) and
collects the per-key count list for the exact median — for
billion-distinct-value keys switch the median to percentile_approx.
For billion-key UniqValueCount use ``approx=True`` (HLL sketch,
approx_count_distinct) — exact distinct at 100 TB is a full shuffle of
(key, value) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALAR_TYPES = [
    "LongValueSum",
    "DoubleValueSum",
    "LongValueMax",
    "LongValueMin",
    "StringValueMax",
    "StringValueMin",
    "UniqValueCount",
]
HISTOGRAM = "ValueHistogram"
KNOWN_TYPES = [*SCALAR_TYPES, HISTOGRAM]


def parse_agg_key(df_kv: DataFrame, strict: bool = True) -> DataFrame:
    """Split ``AggType:key`` (first ':' only, matching the Hadoop
    ValueAggregatorDescriptor TYPE_SEPARATOR contract).

    strict=True (default) raises on a key with no type prefix or an
    unknown aggregator type — a typo like ``LongValuesum:`` must not
    silently produce empty output. strict=False filters them out.
    """
    has_sep = F.instr("key", ":") >= 1
    if strict:
        guarded = F.when(has_sep, F.col("key")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("aggregate: malformed descriptor (missing 'AggType:' prefix): "),
                    F.col("key"),
                )
            )
        )
        df = df_kv.select(guarded.alias("key"), "value")
    else:
        df = df_kv.where(has_sep)
    parsed = df.select(
        F.split_part("key", F.lit(":"), F.lit(1)).alias("agg_type"),
        F.expr("substring(key, instr(key, ':') + 1)").alias("key"),
        "value",
    )
    if strict:
        t = F.col("agg_type")
        checked = F.when(t.isin(KNOWN_TYPES), t).otherwise(
            F.raise_error(F.concat(F.lit("aggregate: unknown aggregator type: "), t))
        )
        parsed = parsed.select(checked.alias("agg_type"), "key", "value")
    return parsed


def aggregate_scalars(parsed: DataFrame, approx: bool = False) -> DataFrame:
    """All scalar aggregators in ONE shuffle: conditional aggregates per
    type over groupBy(agg_type, key), then a CASE picks the result."""
    t = F.col("agg_type")
    long_v = F.col("value").cast("long")
    dbl_v = F.col("value").cast("double")
    uniq = (
        F.approx_count_distinct(F.when(t == "UniqValueCount", F.col("value")))
        if approx
        else F.countDistinct(F.when(t == "UniqValueCount", F.col("value")))
    )
    agg = (
        parsed.where(t.isin(SCALAR_TYPES))
        .groupBy("agg_type", "key")
        .agg(
            F.sum(F.when(t == "LongValueSum", long_v)).alias("_lsum"),
            F.sum(F.when(t == "DoubleValueSum", dbl_v)).alias("_dsum"),
            F.max(F.when(t == "LongValueMax", long_v)).alias("_lmax"),
            F.min(F.when(t == "LongValueMin", long_v)).alias("_lmin"),
            F.max(F.when(t == "StringValueMax", F.col("value"))).alias("_smax"),
            F.min(F.when(t == "StringValueMin", F.col("value"))).alias("_smin"),
            uniq.alias("_uniq"),
        )
    )
    result = (
        F.when(t == "LongValueSum", F.col("_lsum").cast("string"))
        .when(t == "DoubleValueSum", F.col("_dsum").cast("string"))
        .when(t == "LongValueMax", F.col("_lmax").cast("string"))
        .when(t == "LongValueMin", F.col("_lmin").cast("string"))
        .when(t == "StringValueMax", F.col("_smax"))
        .when(t == "StringValueMin", F.col("_smin"))
        .when(t == "UniqValueCount", F.col("_uniq").cast("string"))
    )
    return agg.select("agg_type", "key", result.alias("value"))


def value_histogram(parsed: DataFrame) -> DataFrame:
    """ValueHistogram: per key, statistics over the FREQUENCIES of the
    distinct values (hadoop ValueHistogram report: unique-count, min,
    median, max, average, stddev of the per-value counts).

    Hadoop parity: the median is the sorted element at index n/2 (a
    long, NOT interpolated), min/median/max are longs; avg/stddev are
    computed from exact integer sums so the doubles are deterministic
    across engines.
    """
    freqs = (
        parsed.where(F.col("agg_type") == HISTOGRAM)
        .groupBy("agg_type", "key", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return freqs.groupBy("agg_type", "key").agg(
        F.count(F.lit(1)).alias("distinct_values"),
        F.min("cnt").alias("min_count"),
        # sorted element at index n/2, 0-based -> element_at is 1-based
        F.expr(
            "element_at(sort_array(collect_list(cnt)), cast(count(1) div 2 as int) + 1)"
        ).alias("median_count"),
        F.max("cnt").alias("max_count"),
        F.expr("cast(sum(cnt) as double) / count(1)").alias("avg_count"),
        # population stddev from exact integer sums: deterministic IEEE
        # op sequence (sum_sq/n - mean*mean under one sqrt)
        F.expr(
            "sqrt(cast(sum(cnt * cnt) as double) / count(1) "
            "- (cast(sum(cnt) as double) / count(1)) * (cast(sum(cnt) as double) / count(1)))"
        ).alias("stddev_count"),
    )


def histogram_report_lines(hist: DataFrame) -> DataFrame:
    """Serialize value_histogram output to the reference's tab-joined
    report string (parity/pipe mode): counts as longs, moments as
    doubles."""
    value = F.concat_ws(
        "\t",
        F.col("distinct_values").cast("string"),
        F.col("min_count").cast("string"),
        F.col("median_count").cast("string"),
        F.col("max_count").cast("string"),
        F.col("avg_count").cast("string"),
        F.col("stddev_count").cast("string"),
    )
    return hist.select("agg_type", "key", value.alias("value"))


def aggregate_reduce(df_kv: DataFrame, approx: bool = False, strict: bool = True) -> DataFrame:
    """Full ``-reducer aggregate`` semantics: (key, value) lines where
    key = ``AggType:realkey`` -> aggregated (key, value) strings.

    Output key is the real key (the reducer strips the type prefix),
    matching the reference's final output layout (S8).
    """
    parsed = parse_agg_key(df_kv, strict=strict)
    scalars = aggregate_scalars(parsed, approx=approx)
    hist = histogram_report_lines(value_histogram(parsed))
    return scalars.unionByName(hist).select("key", "value")
