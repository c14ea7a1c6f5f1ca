"""as-of join semantics: <= matching, tie-breaking, tolerance, and
no-match nulls — pinned on a tiny hand-computed fixture."""

from __future__ import annotations

import datetime as dt

from hadoop_multiple_streaming_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_shared_tie_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100),
            (1, ts("2024-01-01 12:00:00"), 101),
            (2, ts("2024-01-01 09:00:00"), 102),
        ],
        "k long, ts timestamp, eid long",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 51),
            (1, ts("2024-01-01 10:00:00"), 52),
            (1, ts("2024-01-01 11:00:00"), 53),
            (2, ts("2024-01-01 09:30:00"), 54),
        ],
        "k long, ts timestamp, eid long",
    )
    got = {
        r.eid: (r.asof_eid, r.asof_ts)
        for r in asof_join(
            left, right, by=["k"], ts_col="ts", value_cols=["eid"], tie_col="eid"
        ).collect()
    }
    assert got[100][0] == 52  # same-ts right matches; larger tie id wins
    assert got[101][0] == 53  # latest prior
    assert got[102] == (None, None)  # right row is in the future

    # 30-minute tolerance: the 11:00 view is 60 min before the 12:00
    # click -> nulled; same-ts match survives
    tol = {
        r.eid: r.asof_eid
        for r in asof_join(
            left,
            right,
            by=["k"],
            ts_col="ts",
            value_cols=["eid"],
            tie_col="eid",
            tolerance_seconds=1800,
        ).collect()
    }
    assert tol[100] == 52 and tol[101] is None and tol[102] is None


def test_asof_join_single_shuffle(spark):
    import contextlib
    import io as _io

    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), 1)], "k long, ts timestamp, eid long")
    right = spark.createDataFrame([(1, ts("2024-01-01 09:00:00"), 2)], "k long, ts timestamp, eid long")
    df = asof_join(left, right, by=["k"], ts_col="ts", value_cols=["eid"], tie_col="eid")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    shuffles = [l for l in plan.splitlines() if "Arguments: hashpartitioning" in l]
    assert len(shuffles) == 1, shuffles  # union + one window shuffle, no join
    assert "Join" not in plan


def test_interval_join_exact_boundary_and_uniqueness(spark):
    from hadoop_multiple_streaming_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1)], "k long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:05:00"), 10),  # exactly +300s: in
            (1, ts("2024-01-01 09:55:00"), 11),  # exactly -300s: in
            (1, ts("2024-01-01 10:05:01"), 12),  # +301s: out
            (2, ts("2024-01-01 10:00:00"), 13),  # other key: out
        ],
        "k long, ts timestamp, rid long",
    )
    out = interval_join(
        left, right, by=["k"], ts_col="ts", tolerance_seconds=300, right_cols=["rid"]
    ).collect()
    assert sorted(r.r_rid for r in out) == [10, 11]
    # each true pair appears exactly once despite the 3-bin explode
    assert len(out) == 2
