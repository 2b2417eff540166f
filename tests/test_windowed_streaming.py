"""Event-time windowed aggregation with watermark (streaming/windowed.py)."""

import datetime as dt

from pyspark.sql import functions as F

from breg_dcat_harvester_spark.schema import TRANSCRIPTS
from breg_dcat_harvester_spark.streaming.windowed import (
    run_windowed_stream,
    windowed_turn_counts,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _rows(start_min: int, n: int, role: str = "user"):
    return [
        (
            f"c{start_min}",
            i,
            role,
            "hello [[dataset|id=d1|title=x]]" if i % 2 == 0 else "plain",
            None,
            T0 + dt.timedelta(minutes=start_min, seconds=30 * i),
        )
        for i in range(n)
    ]


def test_windowed_counts_batch_parity(spark):
    df = spark.createDataFrame(_rows(0, 8) + _rows(10, 4, role="assistant"), TRANSCRIPTS)
    got = {
        (r.window_start, r.role): (r.n_turns, r.n_mentions)
        for r in windowed_turn_counts(df, window="10 minutes").collect()
    }
    # rows(0, 8): 8 turns over minutes 0..3.5 -> one 10-min window, 4 mentions
    assert got[(T0, "user")] == (8, 4)
    assert got[(T0 + dt.timedelta(minutes=10), "assistant")] == (4, 2)


def test_windowed_stream_append_emits_finalized_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    early = spark.createDataFrame(_rows(0, 6), TRANSCRIPTS)
    early.coalesce(1).write.mode("append").parquet(src)
    # activation 1: watermark starts at -inf -> nothing finalized yet
    first = run_windowed_stream(spark, src, ckpt, window="10 minutes", delay="5 minutes")

    # a much later event pushes the watermark past window_end(0-10min)+delay
    late = spark.createDataFrame(_rows(60, 1), TRANSCRIPTS)
    late.coalesce(1).write.mode("append").parquet(src)
    second = run_windowed_stream(spark, src, ckpt, window="10 minutes", delay="5 minutes")

    emitted = {
        (r.window_start, r.role): (r.n_turns, r.n_mentions) for r in first + second
    }
    # the early window must now be finalized with exact batch-equal counts
    batch = {
        (r.window_start, r.role): (r.n_turns, r.n_mentions)
        for r in windowed_turn_counts(early, window="10 minutes").collect()
    }
    assert emitted[(T0, "user")] == batch[(T0, "user")] == (6, 3)
    # the late window (minute 60) is NOT finalized -> must not be emitted
    assert (T0 + dt.timedelta(minutes=60), "user") not in emitted


def test_windowed_stream_exactly_once_on_retrigger(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_rows(0, 4), TRANSCRIPTS).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_windowed_stream(spark, src, ckpt)
    # re-activation with no new files processes nothing and emits nothing
    again = run_windowed_stream(spark, src, ckpt)
    assert again == []
