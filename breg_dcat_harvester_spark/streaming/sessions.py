"""Event-time session windows with watermarks (streaming extension).

Third member of the streaming family (windowed.py tumbling aggregation,
joins.py stream-stream join): ``F.session_window`` groups events into
dynamic per-key windows that extend while successive events arrive within
``gap`` of the running window end — Structured Streaming's native
sessionization, state merged incrementally per key instead of the batch
lag-window scan (the ``rel_events_sessionize`` shape).

Boundary semantics (pinned by tests and the DuckDB oracle): a session
window is ``[first_ts, last_ts + gap)`` and an event at exactly
``last_ts + gap`` MERGES into the session (inclusive boundary — a new
session starts only when the inter-event gap is strictly greater than
``gap``; same rule as the batch lag-based ``rel_events_sessionize``).
The watermark closes a session once event time passes
``session_end + delay``, which is what bounds state at 100 TB/day: open
sessions per active key, nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"
DEFAULT_DELAY = "2 hours"

from .joins import EVENTS_SCHEMA  # noqa: E402  (same source table)


def session_stats(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    delay: str = DEFAULT_DELAY,
) -> DataFrame:
    """Per-(user, session) rollup ->
    (user_id, session_start, session_end, n_events, value_cents).

    Works identically on batch DataFrames (batch parity, oracle-gated) and
    on ``readStream`` input, where the watermark lets the state store
    drop a session once event time passes its end + delay.  Value summed
    in integer cents (order-exact against the oracle)."""
    src = events
    if events.isStreaming:
        src = src.withWatermark("ts", delay)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


def run_session_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    gap: str = DEFAULT_GAP,
    delay: str = DEFAULT_DELAY,
) -> list:
    """Drain the available event files through the watermarked session
    aggregation in append mode (only watermark-finalized sessions emit)
    and return the emitted rows."""
    rows: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows.extend(batch_df.collect())

    stream = (
        session_stats(
            spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir),
            gap=gap,
            delay=delay,
        )
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return rows
