"""Gap-based sessionization: batch operator + streaming session_window
twin (identical sessions for the same input)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spider_spark.operators import sessions


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _t(mins):
    return T0 + dt.timedelta(minutes=mins)


def test_sessionize_breaks_on_gap(spark):
    rows = [(1, _t(0)), (1, _t(10)), (1, _t(50)), (1, _t(55)), (2, _t(0))]
    got = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessions.sessionize(_ev(spark, rows), gap_s=1800).collect()
    }
    assert got[(1, _t(0))] == 0 and got[(1, _t(10))] == 0
    assert got[(1, _t(50))] == 1 and got[(1, _t(55))] == 1  # 40 min gap
    assert got[(2, _t(0))] == 0


def test_gap_boundary_is_inclusive(spark):
    # exactly gap_s seconds apart -> SAME session; one more second breaks
    rows = [(1, _t(0)), (1, _t(30)), (2, _t(0)), (2, _t(30) + dt.timedelta(seconds=1))]
    got = {
        r["user_id"]: r["session_seq"]
        for r in sessions.sessionize(_ev(spark, rows), gap_s=1800).collect()
        if r["ts"] != _t(0)
    }
    assert got[1] == 0 and got[2] == 1


def test_session_stats_rollup(spark):
    rows = [(1, _t(0)), (1, _t(10)), (1, _t(50)), (1, _t(61)), (1, _t(62))]
    got = {
        r["session_seq"]: r
        for r in sessions.session_stats(_ev(spark, rows), gap_s=600).collect()
    }
    assert got[0]["n_events"] == 2 and got[0]["duration_s"] == 600
    assert got[1]["n_events"] == 1 and got[1]["duration_s"] == 0
    assert got[2]["n_events"] == 2
    assert got[2]["session_start"] == _t(61) and got[2]["session_end"] == _t(62)


def test_single_shuffle_plan(spark):
    # the groupBy key extends the window key: exactly ONE exchange
    df = sessions.session_stats(_ev(spark, [(1, _t(0))]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_streaming_twin_matches_batch(spark, tmp_path):
    from spider_spark import streaming as st

    rows = []
    for u in range(4):
        for k in range(6):
            # user u: events at 0,7,14,21,28,35 min x (u+1) spacing
            rows.append((u, _t(k * 7 * (u + 1))))
    # sentinel: a far-future event advances the GLOBAL watermark past every
    # real session's end, so append mode can emit them all; the sentinel's
    # own session stays open and is excluded from the comparison
    rows.append((99, _t(10_000)))
    src = tmp_path / "events_src"
    _ev(spark, rows).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(str(src))
    out = st.stream_session_stats(stream, gap="20 minutes", watermark="0 seconds")
    st.run_available_now(
        out, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
        if r["user_id"] != 99
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sessions.session_stats(
            _ev(spark, rows), gap_s=1200
        ).collect()
        if r["user_id"] != 99
    }
    # streaming session_window's end is start+gap-extended; compare the
    # (user, start) -> n_events census, the session identity that matters
    assert got == want
