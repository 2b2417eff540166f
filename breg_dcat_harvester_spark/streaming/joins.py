"""Stream-stream time-range join with watermarks (streaming extension).

The reference has no streaming dataflow (SURVEY.md §2.8); this module adds
the second textbook Structured Streaming pattern after windowed aggregation
(windowed.py): joining two unbounded streams under event-time constraints.
The use case is click attribution over the events table — every purchase
joins ALL clicks by the same user within the preceding ``max_lag`` (the
as-of join in operators/asof.py keeps only the latest; attribution wants
the set).

* ``click_attribution_join`` — works identically on batch DataFrames
  (batch parity, oracle-gated as ``rel_events_attribution``) and on
  ``readStream`` inputs, where BOTH sides carry watermarks and the join
  condition includes the time-range predicate — exactly what lets Spark
  purge join state: a buffered click can be dropped once the purchase-side
  watermark passes click.ts + max_lag.  Without the range predicate the
  state would grow forever; this is THE dial at 100 TB/day event volumes.
* ``run_attribution_stream`` — drives it as a genuine stream-stream join
  (two filtered readers of the same source) with ``Trigger.AvailableNow``
  and a foreachBatch drain; pytest asserts the result equals the batch
  join row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_LAG = "1 hour"
DEFAULT_DELAY = "2 hours"

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def click_attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    max_lag: str = DEFAULT_MAX_LAG,
    delay: str = DEFAULT_DELAY,
) -> DataFrame:
    """All (purchase, click) pairs of one user with the click inside
    ``(purchase.ts - max_lag, purchase.ts]`` ->
    (user_id, purchase_id, click_id, lag_us).

    Streaming inputs get watermarks on BOTH sides (required for state
    cleanup on stream-stream joins); batch inputs run the identical plan
    shape — one hash partition per side on user_id, the range predicate
    applied post-match."""
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", delay)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", delay)
    cond = (
        (p["user_id"] == c["c_user_id"])
        & (c["c_ts"] <= p["p_ts"])
        & (c["c_ts"] > p["p_ts"] - F.expr(f"INTERVAL {max_lag}"))
    )
    return p.join(c, cond, "inner").select(
        "user_id",
        "purchase_id",
        "click_id",
        (
            # timestampdiff handles TIMESTAMP and TIMESTAMP_NTZ alike and,
            # for NTZ, measures WALL-CLOCK micros — a session-tz cast +
            # unix_micros would double-count DST transitions between the
            # two naive timestamps
            F.expr("timestampdiff(MICROSECOND, c_ts, p_ts)").cast("long")
        ).alias("lag_us"),
    )


def run_attribution_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    max_lag: str = DEFAULT_MAX_LAG,
    delay: str = DEFAULT_DELAY,
) -> list:
    """Drain the available event files through the stream-stream join and
    return the emitted rows.  Two filtered readers of the same source make
    both join inputs genuine streams (the plan is a real
    StreamingSymmetricHashJoin, not a stream-static join)."""
    rows: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows.extend(batch_df.collect())

    src = lambda: spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)  # noqa: E731
    out = click_attribution_join(
        src().filter(F.col("event_type") == "purchase"),
        src().filter(F.col("event_type") == "click"),
        max_lag=max_lag,
        delay=delay,
    )
    stream = (
        out.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return rows
