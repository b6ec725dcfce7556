"""Streaming sessionization via native session_window: gap merging,
watermark-driven finalization, exactly-once across checkpoint restarts,
and agreement with the batch sessionize operator on the same events."""

import datetime

from openmsistream_spark.streaming.timeseries import sessionize_stream

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def _run(spark, in_dir, out_dir, ckpt):
    src = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(f"{in_dir}/batch=*")
    q = (
        sessionize_stream(
            src, gap="30 minutes", watermark="30 minutes", value_col="value"
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"


def test_sessions_merge_and_finalize(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # user 1: events at 00:00/00:10/00:25 chain into ONE session (each
    # gap < 30 min) even though first->last exceeds the gap; the 01:30
    # event starts a second session. user 2: one singleton event.
    spark.createDataFrame(
        [
            (1, _ts(0), 1.0),
            (1, _ts(10), 2.0),
            (1, _ts(25), 3.0),
            (1, _ts(90), 4.0),
            (2, _ts(5), 10.0),
        ],
        "user_id long, ts timestamp, value double",
    ).write.parquet(f"{in_dir}/batch=0")
    # sentinel far in the future closes every session above
    spark.createDataFrame(
        [(99, _ts(600), 0.0)], "user_id long, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=1")
    _run(spark, in_dir, out_dir, ckpt)

    got = sorted(
        (r.user_id, r.session_start, r.last_event, r.duration_seconds,
         r.n_events, r.value_sum)
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id != 99
    )
    assert got == [
        (1, _ts(0), _ts(25), 1500.0, 3, 6.0),   # chained 3-event session
        (1, _ts(90), _ts(90), 0.0, 1, 4.0),     # singleton: zero span
        (2, _ts(5), _ts(5), 0.0, 1, 10.0),
    ]


def test_sessions_exactly_once_and_open_session_held(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(10), 1.0)],
        "user_id long, ts timestamp, value double",
    ).write.parquet(f"{in_dir}/batch=0")
    # watermark after batch 0 is 00:10 - 30 min => user 1's session
    # (closes at 00:40) is still OPEN: nothing may emit yet
    _run(spark, in_dir, out_dir, ckpt)
    try:
        n0 = spark.read.parquet(out_dir).count()
    except Exception:
        n0 = 0  # no files yet — valid "nothing emitted" state
    assert n0 == 0

    # sentinel closes it; the same checkpoint must emit it exactly once
    spark.createDataFrame(
        [(99, _ts(300), 0.0)], "user_id long, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=1")
    _run(spark, in_dir, out_dir, ckpt)
    rows = [r for r in spark.read.parquet(out_dir).collect() if r.user_id == 1]
    assert len(rows) == 1 and rows[0].n_events == 2

    # replaying another sentinel through the same checkpoint re-emits
    # nothing for user 1
    spark.createDataFrame(
        [(99, _ts(330), 0.0)], "user_id long, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=2")
    _run(spark, in_dir, out_dir, ckpt)
    rows = [r for r in spark.read.parquet(out_dir).collect() if r.user_id == 1]
    assert len(rows) == 1


def test_streaming_sessions_agree_with_batch_sessionize(spark, tmp_path):
    """Same events through the batch lag+break-sum operator: session
    boundaries and per-session event counts must agree."""
    from openmsistream_spark.operators.timeseries import sessionize

    events = [
        (1, _ts(0), 1.0),
        (1, _ts(20), 1.0),
        (1, _ts(60), 1.0),   # 40-min gap -> new session
        (1, _ts(75), 1.0),
        (2, _ts(0), 1.0),
        (2, _ts(29), 1.0),   # 29-min gap -> same session
    ]
    sdf = spark.createDataFrame(events, "user_id long, ts timestamp, value double")
    batch = (
        sessionize(sdf, key="user_id", ts_col="ts", gap="30 minutes")
        .groupBy("user_id", "session_id")
        .agg(
            {"ts": "min", "*": "count"},
        )
        .withColumnRenamed("min(ts)", "session_start")
        .withColumnRenamed("count(1)", "n_events")
    )
    batch_set = {
        (r.user_id, r.session_start, r.n_events) for r in batch.collect()
    }

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        events, "user_id long, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=0")
    spark.createDataFrame(
        [(99, _ts(600), 0.0)], "user_id long, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=1")
    _run(spark, in_dir, out_dir, ckpt)
    stream_set = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id != 99
    }
    assert stream_set == batch_set
