"""Event-time windowed aggregation with watermarks (streaming extension).

The reference has no streaming dataflow (SURVEY.md §2.8) — this is the
additive operator a continuously-ingested transcript corpus needs: tumbling
event-time windows over ``ts`` with a watermark bounding state for late
data.  Semantics are the textbook Structured Streaming pattern:

* ``windowed_turn_counts``  — per (window, role) turn/mention counts.
  Works identically on a batch DataFrame (batch parity — tested against
  the same groupBy on the static frame) and on ``readStream`` input.
* ``run_windowed_stream``   — drives it as a stream with
  ``Trigger.AvailableNow`` and an append-mode memory/foreachBatch sink;
  the watermark closes windows once event time passes window_end + delay,
  so only finalized windows are emitted (exactly the late-data contract).

Scale notes: windowed aggregation state is keyed by (window, role) — tiny —
and the watermark bounds it; the shuffle is the same partial-agg hash
exchange as any groupBy.  At 100 TB/day ingest the window duration and
watermark delay are the state-size dials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TRANSCRIPTS

DEFAULT_WINDOW = "10 minutes"
DEFAULT_DELAY = "30 minutes"


def windowed_turn_counts(
    transcripts: DataFrame,
    window: str = DEFAULT_WINDOW,
    delay: str | None = DEFAULT_DELAY,
) -> DataFrame:
    """Tumbling event-time windows: (window_start, window_end, role,
    n_turns, n_mentions).  ``delay=None`` skips the watermark (batch use)."""
    src = transcripts
    if delay is not None and transcripts.isStreaming:
        src = src.withWatermark("ts", delay)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(
                F.size(F.regexp_extract_all("text", F.lit(r"\[\["), F.lit(0)))
            )
            .cast("long")
            .alias("n_mentions"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "n_mentions",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    transcripts_dir: str,
    checkpoint_dir: str,
    window: str = DEFAULT_WINDOW,
    delay: str = DEFAULT_DELAY,
) -> list:
    """Drain the available files through the watermarked windowed agg in
    append mode (only watermark-finalized windows are emitted) and return
    the emitted rows."""
    rows: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows.extend(batch_df.collect())

    stream = (
        windowed_turn_counts(
            spark.readStream.schema(TRANSCRIPTS).parquet(transcripts_dir),
            window=window,
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
