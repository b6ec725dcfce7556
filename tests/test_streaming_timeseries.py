"""Streaming gap-fill + LOCF: watermark-closed buckets, timer-driven
flush for keys with no further arrivals, exactly-once bucket rows."""

import datetime

from openmsistream_spark.streaming.timeseries import gapfill_locf_stream

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def _run(spark, in_dir, out_dir, ckpt, key_type="long"):
    src = spark.readStream.schema(
        f"user_id {key_type}, ts timestamp, value double"
    ).parquet(f"{in_dir}/batch=*")
    q = (
        gapfill_locf_stream(src, bucket="1 hour", watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"


def test_streaming_gapfill_emits_closed_and_gap_buckets(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # batch 0 — user 1: two events in hour 0 (latest value wins), one in
    # hour 2; nothing in hour 1 (the gap to fill)
    spark.createDataFrame(
        [
            (1, _ts(10), 1.0),
            (1, _ts(40), 2.0),
            (1, _ts(135), 5.0),
        ],
        "user_id long, ts timestamp, value double",
    ).write.parquet(f"{in_dir}/batch=0")
    # batch 1 — sentinel key pushes the watermark past hour 0's end
    spark.createDataFrame(
        [(99, _ts(360), 0.0)], "user_id long, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=1")
    _run(spark, in_dir, out_dir, ckpt)

    expected_user1 = [
        (1, _ts(0), 2.0, 2, False),   # latest-of-two value wins the bucket
        (1, _ts(60), 2.0, 0, True),   # empty hour: LOCF carry, timer-flushed
        (1, _ts(120), 5.0, 1, False),
    ]
    got = {
        (r.key, r.bucket_start, r.value_locf, r.n_events, r.is_gap)
        for r in spark.read.parquet(out_dir).collect()
    }
    # the sentinel pushed the watermark to 05:30; availableNow runs a
    # final watermark-advance batch, so all three closed buckets flush
    assert sorted(t for t in got if t[0] == 1) == expected_user1

    # batch 2 — another sentinel through the SAME checkpoint: nothing
    # may re-emit (exactly-once) and the drained key stays quiet
    spark.createDataFrame(
        [(99, _ts(390), 0.0)], "user_id long, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=2")
    _run(spark, in_dir, out_dir, ckpt)

    rows = spark.read.parquet(out_dir).collect()
    user1 = sorted(
        (r.key, r.bucket_start, r.value_locf, r.n_events, r.is_gap)
        for r in rows
        if r.key == 1
    )
    # exactly one row per bucket — parquet-append across two runs would
    # expose any re-emission as a duplicate row here
    assert user1 == expected_user1
    # the sentinel key's hour-6 bucket is not closed yet (watermark
    # 06:00 < its end at 07:00) and gaps never extend past the newest
    # observation, so key 99 stays silent
    assert not any(r.key == 99 for r in rows)


def test_streaming_gapfill_string_keys_stay_distinct(spark, tmp_path):
    """Non-numeric keys must keep their own series (regression: an
    implicit cast-to-long folded every string key into one null group)."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        [
            ("alice", _ts(5), 1.0),
            ("bob", _ts(10), 9.0),
            ("alice", _ts(125), 2.0),
            ("bob", _ts(70), 8.0),
        ],
        "user_id string, ts timestamp, value double",
    ).write.parquet(f"{in_dir}/batch=0")
    spark.createDataFrame(
        [("carol", _ts(600), 0.0)], "user_id string, ts timestamp, value double"
    ).write.parquet(f"{in_dir}/batch=1")
    _run(spark, in_dir, out_dir, ckpt, key_type="string")

    rows = spark.read.parquet(out_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append((r.bucket_start, r.value_locf, r.is_gap))
    assert sorted(by_key) == ["alice", "bob"]
    assert sorted(by_key["alice"]) == [
        (_ts(0), 1.0, False),
        (_ts(60), 1.0, True),
        (_ts(120), 2.0, False),
    ]
    assert sorted(by_key["bob"]) == [(_ts(0), 9.0, False), (_ts(60), 8.0, False)]
