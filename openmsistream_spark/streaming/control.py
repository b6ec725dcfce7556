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
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

HeartbeatEmit = Callable[[str, str], None]  # (key, value_json) -> None


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
