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


#: sentinel agg_type for lines without an 'AggType:' prefix — carried
#: through the aggregation and raised on at GROUP level (see below)
MISSING_PREFIX = "<missing-prefix>"


def parse_agg_key(df_kv: DataFrame, strict: bool = True) -> DataFrame:
    """Split ``AggType:key`` (first ':' only, matching the Hadoop
    ValueAggregatorDescriptor TYPE_SEPARATOR contract).

    strict=True (default) keeps malformed rows under a sentinel type so
    aggregate_scalars can fail loudly (Hadoop's ValueAggregator throws
    on unknown descriptors); strict=False drops them. Validation is
    deliberately NOT a per-row raise_error here: raise_error is
    CodegenFallback in Spark, and one guard in this projection pushes
    the whole text hot path into interpreted mode (~2.5x slower
    measured). Instead the raise happens after aggregation, per
    (agg_type, key) group — same loud failure, negligible cost.
    """
    has_sep = F.instr("key", ":") >= 1
    parsed = df_kv.select(
        F.when(has_sep, F.split_part("key", F.lit(":"), F.lit(1)))
        .otherwise(F.lit(MISSING_PREFIX))
        .alias("agg_type"),
        F.when(has_sep, F.expr("substring(key, instr(key, ':') + 1)"))
        .otherwise(F.col("key"))
        .alias("key"),
        "value",
    )
    if not strict:
        parsed = parsed.where(F.col("agg_type").isin(KNOWN_TYPES))
    return parsed


def aggregate_scalars(
    parsed: DataFrame, approx: bool = False, strict: bool = True
) -> DataFrame:
    """Scalar aggregators, planned for the hot path:

    * the six non-distinct aggregators share ONE shuffle (a single
      hash aggregation with per-type conditional buffers);
    * UniqValueCount gets a SEPARATE filtered branch: a distinct
      aggregate makes Catalyst first group by (agg_type, key, value) —
      an |input|-sized hash table — so it must only ever see its own
      rows, not every row of a multiplexed job (measured 3x otherwise);
    * strict validation raises on unknown/malformed descriptors AFTER
      aggregation, per group: the per-group CASE hits raise_error
      (CodegenFallback — cheap on group-cardinality rows, ruinous
      per input row).
    """
    t = F.col("agg_type")
    long_v = F.col("value").cast("long")
    dbl_v = F.col("value").cast("double")
    non_uniq = [x for x in SCALAR_TYPES if x != "UniqValueCount"]
    plain_in = (
        # strict mode lets unknown types through to the post-agg raise
        parsed.where(~t.isin(["UniqValueCount", HISTOGRAM]))
        if strict
        else parsed.where(t.isin(non_uniq))
    )
    plain = plain_in.groupBy("agg_type", "key").agg(
        F.sum(F.when(t == "LongValueSum", long_v)).alias("_lsum"),
        F.sum(F.when(t == "DoubleValueSum", dbl_v)).alias("_dsum"),
        F.max(F.when(t == "LongValueMax", long_v)).alias("_lmax"),
        F.min(F.when(t == "LongValueMin", long_v)).alias("_lmin"),
        F.max(F.when(t == "StringValueMax", F.col("value"))).alias("_smax"),
        F.min(F.when(t == "StringValueMin", F.col("value"))).alias("_smin"),
    )
    result = (
        F.when(t == "LongValueSum", F.col("_lsum").cast("string"))
        .when(t == "DoubleValueSum", F.col("_dsum").cast("string"))
        .when(t == "LongValueMax", F.col("_lmax").cast("string"))
        .when(t == "LongValueMin", F.col("_lmin").cast("string"))
        .when(t == "StringValueMax", F.col("_smax"))
        .when(t == "StringValueMin", F.col("_smin"))
    )
    if strict:
        result = result.otherwise(
            F.raise_error(
                F.when(
                    t == MISSING_PREFIX,
                    F.concat(
                        F.lit("aggregate: malformed descriptor (missing 'AggType:' prefix) "
                              "for key: "),
                        F.col("key"),
                    ),
                ).otherwise(
                    F.concat(F.lit("aggregate: unknown aggregator type: "), t)
                )
            )
        )
    plain_out = plain.select("agg_type", "key", result.alias("value"))
    uniq_agg = (
        F.approx_count_distinct("value") if approx else F.countDistinct("value")
    )
    uniq_out = (
        parsed.where(t == "UniqValueCount")
        .groupBy("agg_type", "key")
        .agg(uniq_agg.cast("string").alias("value"))
    )
    return plain_out.unionByName(uniq_out)


def value_frequencies(parsed: DataFrame) -> DataFrame:
    """Level-1 aggregation shared by every aggregator: distinct
    (agg_type, key, value) triples with their row counts. ONE shuffle
    over the input with map-side partial combine; every downstream
    aggregate (sum = value x cnt, distinct = triple count, histogram =
    stats over cnt) derives from this small intermediate."""
    return parsed.groupBy("agg_type", "key", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_stats(freqs: DataFrame, group_cols: list[str]) -> DataFrame:
    """The ValueHistogram statistics aggregation over a ``cnt``
    frequency relation, factored out so the typed/fused query forms
    and the descriptor path share ONE definition of the report math
    (Hadoop parity: median = sorted element at index n/2, NOT
    interpolated; avg/stddev from exact integer sums so the doubles
    are deterministic across engines)."""
    return freqs.groupBy(*group_cols).agg(
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


def value_histogram(parsed: DataFrame) -> DataFrame:
    """ValueHistogram: per key, statistics over the FREQUENCIES of the
    distinct values (hadoop ValueHistogram report: unique-count, min,
    median, max, average, stddev of the per-value counts).

    Hadoop parity: the median is the sorted element at index n/2 (a
    long, NOT interpolated), min/median/max are longs; avg/stddev are
    computed from exact integer sums so the doubles are deterministic
    across engines.
    """
    freqs = value_frequencies(parsed.where(F.col("agg_type") == HISTOGRAM))
    return histogram_stats(freqs, ["agg_type", "key"])


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


#: types computable in ONE direct aggregation (no per-value distinct
#: level needed): plain sums and max/min
DIRECT_TYPES = frozenset(
    {
        "LongValueSum",
        "DoubleValueSum",
        "LongValueMax",
        "LongValueMin",
        "StringValueMax",
        "StringValueMin",
    }
)


def _strict_otherwise(result, t, menu: set[str] | None = None):
    """Strict-mode fallthrough. With a declared ``menu``, a row whose
    type is KNOWN but simply undeclared gets a 'not in the declared
    types menu' diagnostic instead of the misleading 'unknown
    aggregator type' (the type IS known — the caller just didn't
    declare it)."""
    unknown = F.concat(F.lit("aggregate: unknown aggregator type: "), t)
    if menu is not None:
        undeclared = [ty for ty in KNOWN_TYPES if ty not in menu]
        if undeclared:
            unknown = F.when(
                t.isin(undeclared),
                F.concat(
                    F.lit("aggregate: type "),
                    t,
                    F.lit(
                        " is not in the declared types menu "
                        f"{sorted(menu)} (add it to `types` or drop strict)"
                    ),
                ),
            ).otherwise(unknown)
    return result.otherwise(
        F.raise_error(
            F.when(
                t == MISSING_PREFIX,
                F.concat(
                    F.lit(
                        "aggregate: malformed descriptor (missing 'AggType:' "
                        "prefix) for key: "
                    ),
                    F.col("key"),
                ),
            ).otherwise(unknown)
        )
    )


def _aggregate_direct(parsed: DataFrame, menu: set[str], strict: bool) -> DataFrame:
    """Single-level plan for declared pure-scalar menus: groupBy
    (agg_type, key) straight off the parsed lines — ONE shuffle with
    map-side partial combine, no (type, key, value) frequency level.
    At 100 TB this is the difference between shuffling O(groups) and
    shuffling O(distinct (key, value)) — for sums over high-cardinality
    values (revenue cents, ids) the frequency level is O(rows).

    Only the DECLARED types' buffers are built: string min/max buffers
    force the whole aggregation into SortAggregate (immutable buffer
    type), so a numeric-only menu must not carry them — numeric menus
    stay HashAggregate with whole-stage codegen."""
    t = F.col("agg_type")
    long_v = F.col("value").cast("long")
    dbl_v = F.col("value").cast("double")
    buffers = {
        "LongValueSum": F.sum(F.when(t == "LongValueSum", long_v)),
        "DoubleValueSum": F.sum(F.when(t == "DoubleValueSum", dbl_v)),
        "LongValueMax": F.max(F.when(t == "LongValueMax", long_v)),
        "LongValueMin": F.min(F.when(t == "LongValueMin", long_v)),
        "StringValueMax": F.max(F.when(t == "StringValueMax", F.col("value"))),
        "StringValueMin": F.min(F.when(t == "StringValueMin", F.col("value"))),
    }
    declared = [ty for ty in buffers if ty in menu]
    agg = parsed.groupBy("agg_type", "key").agg(
        *[buffers[ty].alias(f"_b_{ty}") for ty in declared]
    )
    result = None
    for ty in declared:
        col = F.col(f"_b_{ty}")
        rendered = col if ty.startswith("String") else col.cast("string")
        result = (
            F.when(t == ty, rendered)
            if result is None
            else result.when(t == ty, rendered)
        )
    if strict:
        result = _strict_otherwise(result, t, menu)
    return agg.select("key", result.alias("value"))


def aggregate_reduce(
    df_kv: DataFrame,
    approx: bool = False,
    strict: bool = True,
    types: list[str] | None = None,
) -> DataFrame:
    """Full ``-reducer aggregate`` semantics: (key, value) lines where
    key = ``AggType:realkey`` -> aggregated (key, value) strings.

    Output key is the real key (the reducer strips the type prefix),
    matching the reference's final output layout (S8). Malformed or
    unknown descriptors fail the job loudly in strict mode (raised
    from the post-aggregation dispatch, per group — never per row).

    Physical plan: ONE scan of the input, one shuffle on
    (agg_type, key, value) with map-side partial combine (the
    value_frequencies level), one tiny shuffle on (agg_type, key).
    Every aggregator derives from the frequency triple: sums as
    value x cnt, UniqValueCount as the triple count (no distinct-agg
    Expand), histogram stats over cnt. Double sums multiply instead of
    repeatedly adding — exact for integral values; for arbitrary
    doubles the rounding differs from row-at-a-time addition by design
    (Hadoop's combiner already made that order unspecified).

    collect_list (for the exact histogram median) only accumulates
    rows of ValueHistogram groups — conditional, so scalar aggregators
    never pay for it. For billion-distinct-value histogram keys switch
    the median to percentile_approx.

    ``types``: optional declared menu (like a Hadoop job knowing which
    descriptors its mapper emits). When every declared type is a plain
    sum/max/min, the frequency level is skipped entirely — one direct
    shuffle (see _aggregate_direct). Rows violating the declaration
    still fail loudly in strict mode.
    """
    parsed = parse_agg_key(df_kv, strict=strict)
    # `types and`: an empty menu (dynamically-built list that came out
    # empty) must fall through to the generic plan, not build a
    # zero-buffer aggregation
    if types and set(types) <= DIRECT_TYPES:
        return _aggregate_direct(parsed, set(types), strict)
    freqs = value_frequencies(parsed)
    t = F.col("agg_type")
    long_v = F.col("value").cast("long")
    dbl_v = F.col("value").cast("double")
    cnt = F.col("cnt")
    h_cnt = F.when(t == HISTOGRAM, cnt)
    uniq_buf = (
        F.approx_count_distinct(F.when(t == "UniqValueCount", F.col("value")))
        if approx
        else F.count(F.when(t == "UniqValueCount", F.col("value")))
    )
    agg = freqs.groupBy("agg_type", "key").agg(
        F.sum(F.when(t == "LongValueSum", long_v * cnt)).alias("_lsum"),
        F.sum(F.when(t == "DoubleValueSum", dbl_v * cnt)).alias("_dsum"),
        F.max(F.when(t == "LongValueMax", long_v)).alias("_lmax"),
        F.min(F.when(t == "LongValueMin", long_v)).alias("_lmin"),
        F.max(F.when(t == "StringValueMax", F.col("value"))).alias("_smax"),
        F.min(F.when(t == "StringValueMin", F.col("value"))).alias("_smin"),
        uniq_buf.alias("_uniq"),
        F.count(h_cnt).alias("_hn"),
        F.min(h_cnt).alias("_hmin"),
        F.max(h_cnt).alias("_hmax"),
        F.sum(h_cnt).alias("_hsum"),
        F.sum(F.when(t == HISTOGRAM, cnt * cnt)).alias("_hsumsq"),
        F.expr(
            f"sort_array(collect_list(case when agg_type = '{HISTOGRAM}' then cnt end))"
        ).alias("_hlist"),
    )
    h_avg = F.expr("cast(_hsum as double) / _hn")
    h_std = F.expr(
        "sqrt(cast(_hsumsq as double) / _hn "
        "- (cast(_hsum as double) / _hn) * (cast(_hsum as double) / _hn))"
    )
    h_median = F.expr("element_at(_hlist, cast(_hn div 2 as int) + 1)")
    hist_report = F.concat_ws(
        "\t",
        F.col("_hn").cast("string"),
        F.col("_hmin").cast("string"),
        h_median.cast("string"),
        F.col("_hmax").cast("string"),
        h_avg.cast("string"),
        h_std.cast("string"),
    )
    result = (
        F.when(t == "LongValueSum", F.col("_lsum").cast("string"))
        .when(t == "DoubleValueSum", F.col("_dsum").cast("string"))
        .when(t == "LongValueMax", F.col("_lmax").cast("string"))
        .when(t == "LongValueMin", F.col("_lmin").cast("string"))
        .when(t == "StringValueMax", F.col("_smax"))
        .when(t == "StringValueMin", F.col("_smin"))
        .when(t == "UniqValueCount", F.col("_uniq").cast("string"))
        .when(t == HISTOGRAM, hist_report)
    )
    if strict:
        result = _strict_otherwise(result, t)
    return agg.select("key", result.alias("value"))
