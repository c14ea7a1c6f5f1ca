"""splitKeyVal contract tests (SURVEY §5 item 1): edge cases pinned from
MultiPipeMapRed.java:403-425 before anything else is built."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark.functions.kv import (
    join_key_val,
    split_key_val,
    to_lines,
    with_key_val,
)


def _split(spark, line, sep="\t", k=1):
    df = spark.createDataFrame([Row(line=line)])
    key, value = split_key_val(F.col("line"), sep, k)
    return df.select(key.alias("k"), value.alias("v")).first()


def test_simple_tab(spark):
    r = _split(spark, "a\tb")
    assert (r.k, r.v) == ("a", "b")


def test_no_separator_whole_line_is_key(spark):
    # MultiPipeMapRed.java:414-418 — key = line, value = ""
    r = _split(spark, "noseparator")
    assert (r.k, r.v) == ("noseparator", "")


def test_value_contains_separators(spark):
    r = _split(spark, "a\tb\tc\td")
    assert (r.k, r.v) == ("a", "b\tc\td")


def test_trailing_separator_empty_value(spark):
    r = _split(spark, "a\t")
    assert (r.k, r.v) == ("a", "")


def test_empty_line(spark):
    r = _split(spark, "")
    assert (r.k, r.v) == ("", "")


def test_multi_field_key(spark):
    # stream.num.map.output.key.fields=2 (MultiPipeMapper.java:123-124)
    r = _split(spark, "a\tb\tc\td", k=2)
    assert (r.k, r.v) == ("a\tb", "c\td")


def test_multi_field_key_not_enough_fields(spark):
    # fewer than k separators -> whole line is key
    r = _split(spark, "a\tb", k=3)
    assert (r.k, r.v) == ("a\tb", "")


def test_multi_field_key_exact_boundary(spark):
    # exactly k separators: value is the (empty) remainder
    r = _split(spark, "a\tb\t", k=2)
    assert (r.k, r.v) == ("a\tb", "")


def test_custom_separator(spark):
    r = _split(spark, "a,b,c", sep=",", k=1)
    assert (r.k, r.v) == ("a", "b,c")


def test_custom_separator_regex_metachar(spark):
    r = _split(spark, "a|b|c", sep="|", k=1)
    assert (r.k, r.v) == ("a", "b|c")


def test_utf8(spark):
    r = _split(spark, "서울\t대한민국")
    assert (r.k, r.v) == ("서울", "대한민국")


def test_join_key_val_hadoop_pads_empty_value(spark):
    df = spark.createDataFrame([Row(key="k", value="")])
    line = df.select(join_key_val("key", "value").alias("l")).first().l
    assert line == "k\t"
    line = df.select(
        join_key_val("key", "value", pad_empty_value=False).alias("l")
    ).first().l
    assert line == "k"


def test_split_join_roundtrip(spark):
    df = spark.createDataFrame([Row(line="a\tb\tc")])
    out = with_key_val(df, "line")
    line = out.select(join_key_val("key", "value").alias("l")).first().l
    assert line == "a\tb\tc"


def test_to_lines_nulls_keep_positions(spark):
    df = spark.createDataFrame([("x", None, 3)], "a string, b string, c int")
    assert to_lines(df).first().line == "x\t\t3"
