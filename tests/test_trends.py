"""Windowed term trends: batch (operators/trends.py) + streaming twin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spider_spark import streaming, synth
from spider_spark.operators import trends


def _ts(minute, hour=0):
    return dt.datetime(2024, 1, 1, hour, minute)


def _epoch(hour, minute=0):
    return int(
        dt.datetime(
            2024, 1, 1, hour, minute, tzinfo=dt.timezone.utc
        ).timestamp()
    )


@pytest.fixture()
def utc(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def test_text_mode_window_counts(utc):
    rows = [
        (_ts(5), "fox fox pad"),
        (_ts(50), "fox"),
        (_ts(5, hour=1), "fox pad"),
    ]
    df = utc.createDataFrame(rows, "warc_ts timestamp, text string")
    got = {
        (r["window_start_epoch"], r["term"]): r["n"]
        for r in trends.term_window_counts(df, window_minutes=60).collect()
    }
    assert got == {
        (_epoch(0), "fox"): 3,
        (_epoch(0), "pad"): 1,
        (_epoch(1), "fox"): 1,
        (_epoch(1), "pad"): 1,
    }


def test_lift_adjacent_only(utc):
    rows = (
        [(_ts(1), "fox")] * 2
        + [(_ts(1, hour=1), "fox")] * 6
        # hour 2: fox absent; hour 3: fox returns -> cold start
        + [(_ts(1, hour=3), "fox")] * 4
    )
    df = utc.createDataFrame(rows, "warc_ts timestamp, text string")
    got = {
        r["window_start_epoch"]: (r["n"], r["prev_n"], r["lift_r"])
        for r in trends.trending_terms(df, window_minutes=60).collect()
    }
    assert got[_epoch(0)] == (2, None, None)
    assert got[_epoch(1)] == (6, 2, 3.0)
    assert got[_epoch(3)] == (4, None, None)  # gap -> cold start


def test_min_count_filters_output_after_lift(utc):
    rows = [(_ts(1), "fox")] * 10 + [(_ts(1, hour=1), "fox")]
    df = utc.createDataFrame(rows, "warc_ts timestamp, text string")
    got = trends.trending_terms(df, window_minutes=60, min_count=1).collect()
    by_w = {r["window_start_epoch"]: r for r in got}
    # the 1-count window survives min_count=1 and still sees prev_n=10
    assert by_w[_epoch(1)]["prev_n"] == 10
    assert abs(by_w[_epoch(1)]["lift_r"] - 0.1) < 1e-9
    # min_count=2 drops it
    got2 = trends.trending_terms(df, window_minutes=60, min_count=2).collect()
    assert {r["window_start_epoch"] for r in got2} == {_epoch(0)}


def test_term_col_mode(utc):
    rows = [(_ts(1), "click"), (_ts(2), "click"), (_ts(1, hour=1), "view")]
    df = utc.createDataFrame(rows, "ts timestamp, event_type string")
    got = {
        (r["window_start_epoch"], r["term"]): r["n"]
        for r in trends.term_window_counts(
            df, ts_col="ts", window_minutes=60, term_col="event_type"
        ).collect()
    }
    assert got == {(_epoch(0), "click"): 2, (_epoch(1), "view"): 1}


def test_stream_twin_matches_batch(utc, tmp_path):
    src = str(tmp_path / "pages")
    synth.generate_pages(utc, 80, n_hosts=4).write.parquet(src)
    stream = streaming.stream_pages(utc, src, max_files_per_trigger=2)
    counts = streaming.stream_trending_terms(stream, window="30 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("trend_twin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["window_start_epoch"], r["term"]): r["n"]
        for r in utc.sql("SELECT * FROM trend_twin").collect()
    }
    # batch twin over the generator's text column (byte-identical to the
    # streamed parse — asserted in test_streaming.py)
    batch = {
        (r["window_start_epoch"], r["term"]): r["n"]
        for r in trends.term_window_counts(
            utc.read.parquet(src), window_minutes=30
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_rejects_bad_window(utc):
    df = utc.createDataFrame([(_ts(0), "x")], "warc_ts timestamp, text string")
    with pytest.raises(ValueError):
        trends.term_window_counts(df, window_minutes=0)
