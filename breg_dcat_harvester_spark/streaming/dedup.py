"""Streaming exact-dedup on ingest (training-data pipeline operator).

The batch dedup family (operators/dedup.py) answers "which documents in
this corpus snapshot are duplicates"; a continuously-ingested corpus also
needs the *ingest-time* form — drop a turn whose content was already seen —
without unbounded state.  Structured Streaming's
``dropDuplicatesWithinWatermark`` is exactly that operator: state is keyed
by the content hash and expired once the event-time watermark passes, so
the dedup window is explicit (``delay``) and state is bounded by
(ingest rate x delay), not corpus size.

Semantics: within one watermark window the FIRST arrival of a content hash
survives; re-arrivals are dropped.  Across windows (state expired) a hash
may be admitted again — the batch near-dup pass downstream catches those.
This split (bounded-state streaming exact-dedup at ingest + periodic batch
MinHash/SimHash sweeps) is the standard two-tier design for a 100 TB/day
pipeline; neither tier alone is sufficient.

Scale notes: the content hash is computed map-side (sha256 of role+text);
the dedup state exchange is keyed by that hash — uniformly spread by
construction, no skew; RocksDB state store holds (hash -> expiry) pairs
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TRANSCRIPTS

DEFAULT_DELAY = "1 hour"

HASH_COLS = ("role", "text")


def with_content_hash(df: DataFrame) -> DataFrame:
    """sha256 over (role, text) — the turn-content identity used by both
    the streaming dedup state key and the batch twin."""
    return df.withColumn(
        "content_hash",
        F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in HASH_COLS]), 256),
    )


def dedup_turns(
    transcripts: DataFrame, delay: str | None = DEFAULT_DELAY
) -> DataFrame:
    """Content-identity dedup; streaming input dedups within the watermark
    window, batch input is the global-exact twin (one row per hash)."""
    hashed = with_content_hash(transcripts)
    if transcripts.isStreaming:
        return hashed.withWatermark("ts", delay or DEFAULT_DELAY) \
            .dropDuplicatesWithinWatermark(["content_hash"])
    return hashed.dropDuplicates(["content_hash"])


def _run_available_now(
    spark: SparkSession,
    transcripts_dir: str,
    checkpoint_dir: str,
    delay: str,
    sink,
) -> None:
    """Shared activation shape: drain available files through the dedup
    (AvailableNow trigger) into ``sink``; dedup state persists in the
    checkpoint across activations (a re-run does not re-admit already-seen
    content)."""
    stream = (
        dedup_turns(
            spark.readStream.schema(TRANSCRIPTS).parquet(transcripts_dir),
            delay=delay,
        )
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()


def run_dedup_stream(
    spark: SparkSession,
    transcripts_dir: str,
    checkpoint_dir: str,
    delay: str = DEFAULT_DELAY,
) -> list:
    """TEST DRAIN ONLY: collect the admitted rows to the driver.  Production
    jobs use ``run_dedup_stream_to_table`` — this variant exists so tests can
    assert on exact admitted rows without reading a sink back."""
    rows: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows.extend(batch_df.collect())

    _run_available_now(spark, transcripts_dir, checkpoint_dir, delay, sink)
    return rows


def run_dedup_stream_to_table(
    spark: SparkSession,
    transcripts_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = DEFAULT_DELAY,
) -> None:
    """Production sink: write admitted turns to a parquet table,
    idempotently per micro-batch.

    ``foreachBatch`` keeps everything executor-side (no driver collect).
    Each micro-batch OVERWRITES its own ``batch_id=<n>`` partition
    directory, so a micro-batch replayed after a crash between write and
    checkpoint commit lands on the same path instead of appending a
    duplicate copy — the standard foreachBatch idempotence recipe; readers
    see ``batch_id`` as a partition column (useful ingestion provenance).
    For an Iceberg catalog the same body swaps to
    ``batch_df.writeTo(...).append()``, where exactly-once comes from
    table-level atomic commits instead (storage.IcebergTable is the
    batch-side analog)."""
    import os

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    _run_available_now(spark, transcripts_dir, checkpoint_dir, delay, sink)
