"""Control plane — the reference's heartbeat/log/console loop as a
StreamingQueryListener (SURVEY §3 control plane).

The reference's ``ControlledProcess`` emits periodic JSON heartbeats
with message/byte counters to a dedicated topic and supports
``check``/``quit`` console commands
(utilities/controlled_processes_heartbeats_logs.py:20-345,
heartbeat_producibles.py:29-101). Under Structured Streaming the same
observability comes from query progress events: this listener turns each
micro-batch's progress into a heartbeat record (program id, timestamp,
rows/sec, rows in batch, sink description) and hands it to a pluggable
emitter — append to a parquet "heartbeat topic", produce to Kafka, or
log. ``query.status`` / ``query.stop()`` are the check/quit commands.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from collections import deque
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

HeartbeatEmit = Callable[[str, str], None]  # (key, value_json) -> None


class LogBuffer(logging.Handler):
    """K7 — bounded, thread-safe ring buffer of formatted log records
    with per-reader drains (reference: utilities/log_handler.py:12-144,
    simplified: a monotone sequence number replaces the reference's
    index+generation pointer pair — same semantics, including readers
    that fall behind losing the overwritten messages).

    Attach to any logger; a LogBatchListener (or caller) periodically
    drains unread messages into one (key, value) log-batch message."""

    def __init__(self, max_messages: int = 128):
        super().__init__()
        self._lock2 = threading.Lock()
        self._max = max_messages
        self._buf: list[tuple[int, str]] = []  # (seq, message)
        self._seq = 0
        self._readers: dict[str, int] = {}  # reader -> last seq seen

    def emit(self, record: logging.LogRecord) -> None:
        msg = self.format(record)
        with self._lock2:
            self._seq += 1
            self._buf.append((self._seq, msg))
            if len(self._buf) > self._max:
                del self._buf[: len(self._buf) - self._max]

    def set_max_messages(self, max_messages: int) -> None:
        with self._lock2:
            self._max = max_messages
            if len(self._buf) > self._max:
                del self._buf[: len(self._buf) - self._max]

    def get_messages(self, reader_id: str = "default") -> list[str]:
        """Unread messages for this reader (and advance its pointer)."""
        with self._lock2:
            last = self._readers.get(reader_id, 0)
            out = [m for s, m in self._buf if s > last]
            self._readers[reader_id] = self._seq
            return out


def log_batch_message(buffer: LogBuffer, program_id: str) -> tuple[str, str]:
    """One drained log-batch as the reference's wire shape (reference:
    utilities/log_producibles.py:10-28): key = "<program_id>_log",
    value = JSON {timestamp, messages:[...]}. Returns the pair even when
    empty (the reference produces on every interval)."""
    value = {
        "timestamp": time.time(),
        "messages": buffer.get_messages(program_id),
    }
    return f"{program_id}_log", json.dumps(value)


class HeartbeatListener(StreamingQueryListener):
    """Collects one heartbeat per completed micro-batch.

    ``emit`` receives (key, json) pairs shaped like the reference's
    heartbeat messages: key = "<program_id>_heartbeat", value = JSON with
    timestamp and counters (heartbeat_producibles.py:38-66). The default
    emitter buffers in-process (``.beats``) for tests/inspection.
    """

    def __init__(self, program_id: str = "openmsistream_spark",
                 emit: HeartbeatEmit | None = None):
        self.program_id = program_id
        self.beats: list[dict] = []
        self._emit = emit

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 (Spark API)
        p = event.progress
        beat = {
            "timestamp": p.timestamp,
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "n_messages_read": p.numInputRows,
            "messages_per_sec": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
        }
        self.beats.append(beat)
        if self._emit is not None:
            self._emit(f"{self.program_id}_heartbeat", json.dumps(beat, default=str))

    def onQueryTerminated(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802 (Spark API)
        pass


def attach_heartbeats(
    spark, program_id: str = "openmsistream_spark", emit: HeartbeatEmit | None = None
) -> HeartbeatListener:
    """Register a HeartbeatListener on the session; returns it (keep the
    handle to read ``.beats`` or to remove it later)."""
    listener = HeartbeatListener(program_id, emit)
    spark.streams.addListener(listener)
    return listener


class LogBatchListener(StreamingQueryListener):
    """K7 — ships buffered log batches through the same transport as
    heartbeats: on each micro-batch progress event (rate-limited by
    ``interval_secs``, the reference's log_interval_secs) the unread tail
    of ``buffer`` is drained into one (key, value) message and handed to
    ``emit`` — Kafka producer, parquet-topic appender, or test list."""

    MAX_RETAINED_BATCHES = 128

    def __init__(
        self,
        buffer: LogBuffer,
        program_id: str = "openmsistream_spark",
        emit: HeartbeatEmit | None = None,
        interval_secs: float = 0.0,
    ):
        self.buffer = buffer
        self.program_id = program_id
        # bounded like LogBuffer — long-running queries fire a progress
        # event per micro-batch and nothing drains this list otherwise
        self.batches: deque[dict] = deque(maxlen=self.MAX_RETAINED_BATCHES)
        self._emit = emit
        self._interval = interval_secs
        self._last = 0.0

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 (Spark API)
        now = time.time()
        if self._interval and (now - self._last) < self._interval:
            return
        self._last = now
        key, value = log_batch_message(self.buffer, self.program_id)
        self.batches.append(json.loads(value))
        if self._emit is not None:
            self._emit(key, value)

    def onQueryTerminated(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802 (Spark API)
        pass


def attach_log_batches(
    spark,
    logger: logging.Logger,
    program_id: str = "openmsistream_spark",
    emit: HeartbeatEmit | None = None,
    interval_secs: float = 0.0,
    max_messages: int = 128,
) -> LogBatchListener:
    """Wire a LogBuffer onto ``logger`` and register a LogBatchListener
    that drains it per micro-batch; returns the listener (its ``.buffer``
    is the handler — detach both when done)."""
    buffer = LogBuffer(max_messages)
    logger.addHandler(buffer)
    listener = LogBatchListener(buffer, program_id, emit, interval_secs)
    spark.streams.addListener(listener)
    return listener
