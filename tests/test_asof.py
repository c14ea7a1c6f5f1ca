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


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """asof_join vs an O(n^2) plain-Python reference over a seeded
    random dataset (many keys, clustered timestamps, same-ts ties)."""
    import random

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    lefts, rights = [], []
    eid = 0
    for _ in range(120):
        eid += 1
        row = (
            rng.randint(1, 8),
            base + dt.timedelta(seconds=rng.randint(0, 50) * 60),  # coarse: ties
            eid,
        )
        (lefts if rng.random() < 0.5 else rights).append(row)

    def brute(l_key, l_ts, tol=None):
        best = None  # (ts, eid)
        for k, ts_, e in rights:
            if k == l_key and ts_ <= l_ts and (best is None or (ts_, e) > best):
                best = (ts_, e)
        if best and tol is not None and (l_ts - best[0]).total_seconds() > tol:
            return None
        return best

    left = spark.createDataFrame(lefts, "k long, ts timestamp, eid long")
    right = spark.createDataFrame(rights, "k long, ts timestamp, eid long")
    for tol in (None, 600):
        got = {
            r.eid: (r.asof_ts, r.asof_eid)
            for r in asof_join(
                left,
                right,
                by=["k"],
                ts_col="ts",
                value_cols=["eid"],
                tie_col="eid",
                tolerance_seconds=tol,
            ).collect()
        }
        assert len(got) == len(lefts)
        for k, ts_, e in lefts:
            want = brute(k, ts_, tol)
            assert got[e] == (want if want else (None, None)), (k, ts_, e, tol)


def test_interval_join_matches_bruteforce_on_random_data(spark):
    import random

    from hadoop_multiple_streaming_spark.operators.asof import interval_join

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    lefts, rights = [], []
    eid = 0
    for _ in range(120):
        eid += 1
        row = (
            rng.randint(1, 6),
            base + dt.timedelta(seconds=rng.randint(0, 7200)),
            eid,
        )
        (lefts if rng.random() < 0.5 else rights).append(row)
    tol = 300
    want = {
        (le, re)
        for lk, lt_, le in lefts
        for rk, rt_, re in rights
        if lk == rk and abs((lt_ - rt_).total_seconds()) <= tol
    }
    left = spark.createDataFrame(lefts, "k long, ts timestamp, eid long")
    right = spark.createDataFrame(rights, "k long, ts timestamp, eid long")
    got = {
        (r.eid, r.r_eid)
        for r in interval_join(
            left, right, by=["k"], ts_col="ts", tolerance_seconds=tol,
            right_cols=["eid"],
        ).collect()
    }
    assert got == want
