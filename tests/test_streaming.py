"""Tests for the Structured Streaming fan-out surface
(streaming.fanout): file-source micro-batches, availableNow trigger."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from hadoop_multiple_streaming_spark.plans.model import Branch
from hadoop_multiple_streaming_spark.streaming.fanout import (
    running_counts,
    stream_fanout,
    windowed_rollup,
)


def test_stream_fanout_two_branches(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "a.txt").write_text("apple\nbanana\napple\n")
    (indir / "b.txt").write_text("cherry\napple\n")

    def upper_mapper(df):
        return df.select(F.upper("value").alias("value"))

    def banana_filter(df):
        return df.where(F.col("value") != "banana")

    stream = spark.readStream.format("text").load(str(indir))
    q = stream_fanout(
        stream,
        [
            Branch("UPPER", mapper=upper_mapper),
            Branch("NOBANANA", mapper=banana_filter),
            Branch("PIPECAT", mapper="cat"),  # subprocess branch
        ],
        output=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    pipecat = spark.read.text(str(tmp_path / "out" / "PIPECAT"))
    # cat branch round-trips each line through splitKeyVal -> key\tvalue
    assert sorted(r.value for r in pipecat.collect()) == [
        "apple\t",
        "apple\t",
        "apple\t",
        "banana\t",
        "cherry\t",
    ]

    # native branches use the same Hadoop-faithful key\tvalue framing
    # as the batch runner (separator always written, empty value kept)
    upper = spark.read.text(str(tmp_path / "out" / "UPPER"))
    assert sorted(r.value for r in upper.collect()) == [
        "APPLE\t",
        "APPLE\t",
        "APPLE\t",
        "BANANA\t",
        "CHERRY\t",
    ]
    nob = spark.read.text(str(tmp_path / "out" / "NOBANANA"))
    assert sorted(r.value for r in nob.collect()) == [
        "apple\t", "apple\t", "apple\t", "cherry\t"
    ]


EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def test_windowed_rollup(spark, tmp_path):
    import datetime as dt

    indir = tmp_path / "events"
    indir.mkdir()
    rows = [
        (dt.datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (dt.datetime(2024, 1, 1, 10, 35), "click", 2.0),
        (dt.datetime(2024, 1, 1, 11, 5), "view", 4.0),
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(str(indir / "p"))

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(indir / "*"))
    rolled = windowed_rollup(stream)
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.hour, r.event_type): (r.cnt, r.sum_value)
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes the 10:00 window (max ts 11:05 - 2h
    # watermark leaves nothing closed) — accept either emitted subset
    for k, v in got.items():
        assert k in {(10, "click"), (11, "view")}
        if k == (10, "click"):
            assert v == (2, 3.0)


def test_session_rollup_windows(spark, tmp_path):
    import datetime as dt

    from hadoop_multiple_streaming_spark.streaming.fanout import session_rollup

    indir = tmp_path / "sess"
    indir.mkdir()
    rows = [
        (dt.datetime(2024, 1, 1, 10, 0), "click", 1.0),
        (dt.datetime(2024, 1, 1, 10, 10), "click", 1.0),  # same session
        (dt.datetime(2024, 1, 1, 12, 0), "click", 1.0),  # new session
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(str(indir / "p"))
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(indir / "*"))
    rolled = session_rollup(stream, ts_col="ts", key_col="event_type", gap="30 minutes")
    q = (
        rolled.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.session_start.hour, r.n_events)
        for r in spark.sql("SELECT * FROM session_test").collect()
    )
    # the 10:00 session (2 events) closes under the final watermark;
    # the 12:00 session may be withheld (append mode) — accept either
    assert (10, 2) in got or got == []


def test_running_counts_stateful(spark, tmp_path):
    indir = tmp_path / "kv"
    indir.mkdir()
    (indir / "a.txt").write_text("x\ny\nx\n")
    stream = (
        spark.readStream.format("text")
        .load(str(indir))
        .select(F.col("value").alias("key"))
    )
    q = (
        running_counts(stream)
        .writeStream.format("memory")
        .queryName("counts_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {r.key: r.total for r in spark.sql("SELECT * FROM counts_test").collect()}
    assert got == {"x": 2, "y": 1}


def test_streaming_dedup_first_arrival_kept(spark, tmp_path):
    from hadoop_multiple_streaming_spark.streaming.fanout import streaming_dedup

    indir = tmp_path / "dedup_in"
    indir.mkdir()
    (indir / "batch.csv").write_text(
        "k1,2024-01-01 10:00:00,first\n"
        "k1,2024-01-01 10:05:00,dup-later\n"
        "k2,2024-01-01 10:01:00,only\n"
        "k1,2024-01-01 10:02:00,dup-mid\n"
    )
    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", TimestampType()),
            StructField("payload", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).csv(str(indir))
    deduped = streaming_dedup(stream, ["key"], ts_col="ts", watermark="1 hour")
    out = str(tmp_path / "dedup_out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.key: r.payload for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"k1", "k2"}
    # within one micro-batch the first-by-arrival-order row wins
    assert rows["k2"] == "only"


def test_stream_enrich_join_picks_up_dim(spark, tmp_path):
    from hadoop_multiple_streaming_spark.streaming.fanout import stream_enrich_join

    indir = tmp_path / "enrich_in"
    indir.mkdir()
    (indir / "events.csv").write_text("u1,click\nu2,view\nu3,click\n")
    dim = spark.createDataFrame(
        [("u1", "pro"), ("u2", "free")], "user_id string, tier string"
    )
    schema = StructType(
        [StructField("user_id", StringType()), StructField("action", StringType())]
    )
    stream = spark.readStream.schema(schema).csv(str(indir))
    enriched = stream_enrich_join(stream, dim, on="user_id")
    out = str(tmp_path / "enrich_out")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.tier) for r in spark.read.parquet(out).collect()}
    assert got == {("u1", "pro"), ("u2", "free"), ("u3", None)}


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """Streaming-batch parity on REAL data: the watermarked windowed
    rollup over the events table (replayed as a file stream) must
    produce exactly the batch groupBy(window) aggregation — Structured
    Streaming's availableNow replay of a static source is semantically
    a batch query."""
    import shutil

    from hadoop_multiple_streaming_spark.workloads.tables import load, normalize_events_ts

    ev = load(spark, "/root/testdata/sf0.001", "events")
    # file streams want a DIRECTORY; stage the single-file table into
    # one, and replay with the RAW schema + the same ts normalization
    # the batch loader applies
    staged = tmp_path / "events_dir"
    staged.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", staged / "part-0.parquet")
    raw_schema = spark.read.parquet(str(staged)).schema
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema).format("parquet").load(str(staged))
    )
    rolled = windowed_rollup(stream, ts_col="ts", key_col="event_type", window="1 hour")
    out = str(tmp_path / "roll_out")
    q = (
        rolled.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "roll_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.window_start, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("double")).alias("sum_value"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                "event_type",
                "cnt",
                "sum_value",
            )
        ).collect()
    }
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch result, and most windows close
    assert got, "stream produced no windows"
    assert len(got) >= len(want) - 50
    for k, v in got.items():
        assert want[k] == v, (k, v, want[k])


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop/restart against the same checkpoint must resume from the
    recorded source offsets: files processed before the stop are NOT
    reprocessed (no duplicates in the file sink), files added while
    down ARE picked up — the restartability contract a 100 TB
    long-running ingest relies on."""
    import datetime as dt

    indir = tmp_path / "in"
    indir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(str(indir / name))

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(indir / "*"))
        q = (
            stream.withColumn("doubled", F.col("value") * 2)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = dt.datetime(2024, 1, 1, 10, 0)
    write_batch("p1", [(t, "click", 1.0), (t, "view", 2.0)])
    run_once()
    first = spark.read.parquet(out).collect()
    assert sorted((r.event_type, r.doubled) for r in first) == [
        ("click", 2.0),
        ("view", 4.0),
    ]

    write_batch("p2", [(t, "scroll", 3.0)])
    run_once()  # restart from the same checkpoint
    final = spark.read.parquet(out).collect()
    assert sorted((r.event_type, r.doubled) for r in final) == [
        ("click", 2.0),
        ("scroll", 6.0),
        ("view", 4.0),
    ]


def test_streaming_curation_filters_redacts_dedups(spark, tmp_path):
    from hadoop_multiple_streaming_spark.streaming.fanout import streaming_curation

    indir = tmp_path / "cur_in"
    indir.mkdir()
    good = (
        "the quick brown fox jumps over the lazy dog and then walks away "
        "into the quiet green field while the sun sets slowly tonight"
    )
    (indir / "batch.csv").write_text(
        # doc 1: good text + an email to scrub
        f"1,2024-01-01 10:00:00,{good} mail me at a.b@example.org now\n"
        # doc 1 again (later duplicate) — must be dropped by dedup
        f"1,2024-01-01 10:05:00,{good} duplicate arrival\n"
        # doc 2: degenerate text -> filtered by the quality gate
        "2,2024-01-01 10:01:00,zz zz zz zz zz\n"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).csv(str(indir))
    curated = streaming_curation(
        stream, watermark="1 hour", min_quality=0.5
    )
    out = str(tmp_path / "cur_out")
    q = (
        curated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1}  # doc 2 quality-filtered, dup dropped
    assert "|||EMAIL|||" in rows[1].redacted
    assert "a.b@example.org" not in rows[1].redacted
    assert rows[1].n_email == 1 and rows[1].quality >= 0.5
