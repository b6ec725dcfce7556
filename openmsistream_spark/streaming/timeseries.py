"""Streaming time-series regularization: gap-fill + LOCF on a live
event stream.

The batch twin is the catalog's ``gapfill_locf_user_hours``
(queries_extras.py): put every key on a dense bucket grid between its
first and last observation, carrying the last value through empty
buckets. On a stream the "last observation" is unbounded state and an
EMPTY bucket produces no input row at all — so closing it cannot be
data-driven. This operator closes buckets against the EVENT-TIME
WATERMARK (``GroupState.getCurrentWatermarkMs``), with an event-time
timer (``GroupStateTimeout.EventTimeTimeout``) parked on the next
unemitted bucket so a key with no further arrivals still gets its
closed buckets flushed. A plain windowed aggregation cannot do this
(windows with zero rows simply don't exist); this is the
``applyInPandasWithState`` shape TimescaleDB's ``time_bucket_gapfill``
takes when run continuously.

Semantics (mirrors the batch query): gaps are filled only BETWEEN
observations of a key — buckets drain while an observed bucket remains
at or ahead of the emit cursor, and after the newest observed bucket is
emitted the key goes quiet until new data arrives (no unbounded
synthetic tail). State per key is one scalar (the LOCF value) plus the
pending observed-bucket buffer — bounded by the key's in-flight
watermark window, independent of stream length.

Exactly-once: emission is a pure function of checkpoint-recovered
watermark + keyed state, so a restart replays the same bucket rows into
the sink (pair with an idempotent foreachBatch sink, e.g. ``batch=<id>``
partition overwrite as in streaming/curation.py).

Reference parity: the reference has no time-series surface; this
extends the streaming layer the same way the curation sink does. The
stateful per-key pattern is shared with streaming/assembly.py:480.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("bucket_start", TimestampType()),
        StructField("value_locf", DoubleType()),
        StructField("n_events", LongType()),
        StructField("is_gap", BooleanType()),
    ]
)

# (next_emit_bucket, last_locf_value, pending buckets / values / counts / ts)
STATE_SCHEMA = StructType(
    [
        StructField("next_emit", LongType()),
        StructField("last_value", DoubleType()),
        StructField("p_buckets", ArrayType(LongType())),
        StructField("p_values", ArrayType(DoubleType())),
        StructField("p_counts", ArrayType(LongType())),
        StructField("p_ts", ArrayType(DoubleType())),
    ]
)


def _make_gapfill_fn(bucket_seconds: int):
    def _gapfill_group(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user = key[0]

        if state.exists:
            next_emit, last_value, pb, pv, pc, pts = state.get
            pending = {
                int(b): [pv[i], int(pc[i]), pts[i]] for i, b in enumerate(pb)
            }
        else:
            next_emit, last_value, pending = None, None, {}

        if not getattr(state, "hasTimedOut", False):
            # merge this batch's events: per bucket keep the LATEST
            # event's value (max ts wins — the batch twin's max_by) + count
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    ts = row.ts.timestamp()
                    b = int(ts // bucket_seconds)
                    if next_emit is not None and b < next_emit:
                        continue  # late beyond an already-emitted bucket
                    cur = pending.get(b)
                    if cur is None:
                        pending[b] = [float(row.value), 1, ts]
                    else:
                        if ts >= cur[2]:
                            cur[0], cur[2] = float(row.value), ts
                        cur[1] += 1
            if next_emit is None and pending:
                next_emit = min(pending)

        # drain every bucket the watermark has closed, as long as an
        # observed bucket remains at or ahead of the cursor (gap-fill
        # BETWEEN observations only — pending empty stops the tail)
        wm = state.getCurrentWatermarkMs()
        out: list[dict] = []
        while pending and next_emit is not None:
            if (next_emit + 1) * bucket_seconds * 1000 > wm:
                break  # bucket not closed yet
            obs = pending.pop(next_emit, None)
            if obs is not None:
                last_value = obs[0]
            out.append(
                {
                    "key": user,
                    "bucket_start": pd.Timestamp(
                        next_emit * bucket_seconds, unit="s"
                    ),
                    "value_locf": last_value,
                    "n_events": obs[1] if obs is not None else 0,
                    "is_gap": obs is None,
                }
            )
            next_emit += 1

        # persist; park a timer on the next unemitted bucket's end while
        # anything is still pending (so it flushes without new arrivals)
        pb = sorted(pending)
        state.update(
            (
                next_emit,
                last_value,
                pb,
                [pending[b][0] for b in pb],
                [pending[b][1] for b in pb],
                [pending[b][2] for b in pb],
            )
        )
        if pending and next_emit is not None:
            timer_ms = (next_emit + 1) * bucket_seconds * 1000
            # a timer must sit strictly beyond the current watermark;
            # if that bucket is somehow already closed (raced by a
            # concurrent drain bound), nudge to the next watermark tick
            state.setTimeoutTimestamp(max(timer_ms, wm + 1))

        if out:
            yield pd.DataFrame(out)
        else:
            yield pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in OUTPUT_SCHEMA.fields}
            )

    return _gapfill_group


_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def gapfill_locf_stream(
    events: DataFrame,
    bucket: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Continuous ``bucket``-grid gap-fill + LOCF per ``key_col``.

    Returns an append-mode stream of
    (key, bucket_start, value_locf, n_events, is_gap) rows; each bucket
    between a key's first and newest observation is emitted exactly
    once, when the watermark passes its end — including buckets no
    event ever landed in. See the module docstring for the
    timer/watermark discipline and state bounds.
    """
    mult, unit = bucket.strip().split()
    bucket_seconds = int(mult) * _UNIT_SECONDS[unit.rstrip("s")]
    # the key rides through with its OWN type (string ids must not be
    # cast-to-long into one merged null group); the output schema's key
    # field mirrors the input column's type
    out_schema = StructType(
        [StructField("key", events.schema[key_col].dataType)]
        + [f for f in OUTPUT_SCHEMA.fields if f.name != "key"]
    )
    keyed = (
        events.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
        .withWatermark("ts", watermark)
        .groupBy("key")
    )
    return keyed.applyInPandasWithState(
        _make_gapfill_fn(bucket_seconds),
        out_schema,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization on a live stream — the continuous twin of
    ``operators/timeseries.sessionize``: where the batch operator labels
    every EVENT with a per-key session_id (lag + running break sum — a
    window over history a stream cannot hold), the streaming form emits
    one row per FINALIZED session using Spark's native
    ``session_window``: the engine merges events whose gaps are below
    ``gap`` into one growing window in the state store and closes it
    when the event-time watermark passes the last event + gap — at which
    point the session is provably complete (any later event would, by
    the watermark contract, be too late to extend it).

    State per key is the open session's bounds + counters (merged
    server-side, RocksDB-spillable); finalized sessions flush in append
    mode, so a parquet/Kafka sink sees each session exactly once per
    checkpoint lineage. The watermark bounds both state size and result
    latency: sessions surface one watermark-delay after they end.

    Returns (key_col, session_start, last_event, duration_seconds,
    n_events[, value_sum]) — session_start is the first event,
    last_event the final one, duration their span (0 for singleton
    sessions; note ``session_window.end`` itself would be
    last_event + gap, the close bound, not the span).
    """
    agg = [F.count("*").alias("n_events"), F.max(ts_col).alias("last_event")]
    if value_col is not None:
        agg.append(F.sum(value_col).alias("value_sum"))
    sw = F.session_window(F.col(ts_col), gap)
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), sw)
        .agg(*agg)
    )
    return out.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        "last_event",
        (
            F.col("last_event").cast("double")
            - F.col("session_window.start").cast("double")
        ).alias("duration_seconds"),
        "n_events",
        *(["value_sum"] if value_col is not None else []),
    )
