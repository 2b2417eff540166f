"""Streaming ingest-dedup (streaming/dedup.py): bounded-state exact dedup
via dropDuplicatesWithinWatermark, checkpointed across activations."""

import datetime as dt

from breg_dcat_harvester_spark.schema import TRANSCRIPTS
from breg_dcat_harvester_spark.streaming.dedup import (
    dedup_turns,
    run_dedup_stream,
    run_dedup_stream_to_table,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _turn(conv, idx, text, minute, role="user"):
    return (conv, idx, role, text, None, T0 + dt.timedelta(minutes=minute))


def test_batch_twin_one_row_per_content(spark):
    df = spark.createDataFrame(
        [
            _turn("a", 0, "same text", 0),
            _turn("b", 0, "same text", 1),      # dup content, other conv
            _turn("a", 1, "other text", 2),
            _turn("c", 0, "same text", 3, role="assistant"),  # role differs -> distinct
        ],
        TRANSCRIPTS,
    )
    out = dedup_turns(df).collect()
    assert len(out) == 3
    assert len({r.content_hash for r in out}) == 3


def test_stream_drops_dups_within_watermark_and_across_activations(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    first_batch = spark.createDataFrame(
        [
            _turn("a", 0, "hello", 0),
            _turn("a", 1, "hello", 1),   # dup within the same activation
            _turn("b", 0, "world", 2),
        ],
        TRANSCRIPTS,
    )
    first_batch.coalesce(1).write.mode("append").parquet(src)
    admitted1 = run_dedup_stream(spark, src, ckpt, delay="1 hour")
    assert sorted((r.conv_id, r.turn_idx) for r in admitted1) == [("a", 0), ("b", 0)]

    # second activation: a re-arrival of "hello" within the watermark window
    # must be dropped by the CHECKPOINTED state, a new content admitted
    second_batch = spark.createDataFrame(
        [
            _turn("c", 0, "hello", 5),
            _turn("c", 1, "fresh", 6),
        ],
        TRANSCRIPTS,
    )
    second_batch.coalesce(1).write.mode("append").parquet(src)
    admitted2 = run_dedup_stream(spark, src, ckpt, delay="1 hour")
    assert sorted((r.conv_id, r.turn_idx) for r in admitted2) == [("c", 1)]


def test_stream_to_table_writes_parquet_and_resumes(spark, tmp_path):
    """Production sink: admitted rows land in a parquet table (no driver
    collect), and a second activation on the same checkpoint does not
    re-admit content already seen by the persisted state."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [
            _turn("a", 0, "hello", 0),
            _turn("a", 1, "hello", 1),
            _turn("b", 0, "world", 2),
        ],
        TRANSCRIPTS,
    ).coalesce(1).write.mode("append").parquet(src)
    run_dedup_stream_to_table(spark, src, out, ckpt, delay="1 hour")
    got1 = spark.read.parquet(out)
    assert sorted((r.conv_id, r.turn_idx) for r in got1.collect()) == [
        ("a", 0), ("b", 0),
    ]
    assert "content_hash" in got1.columns

    # second activation, same checkpoint: "hello" re-arrival must be dropped
    # by the persisted state; only the new content is appended
    spark.createDataFrame(
        [
            _turn("c", 0, "hello", 5),
            _turn("c", 1, "fresh", 6),
        ],
        TRANSCRIPTS,
    ).coalesce(1).write.mode("append").parquet(src)
    run_dedup_stream_to_table(spark, src, out, ckpt, delay="1 hour")
    got2 = spark.read.parquet(out)
    assert sorted((r.conv_id, r.turn_idx) for r in got2.collect()) == [
        ("a", 0), ("b", 0), ("c", 1),
    ]


def test_stream_to_table_replayed_batch_is_idempotent(spark, tmp_path):
    """A micro-batch replayed after a crash between sink write and
    checkpoint commit must not duplicate rows: the sink overwrites its own
    batch_id partition.  Simulated by re-running the sink body directly."""
    import os

    from breg_dcat_harvester_spark.schema import TRANSCRIPTS

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [_turn("a", 0, "hello", 0), _turn("b", 0, "world", 1)], TRANSCRIPTS
    ).coalesce(1).write.mode("append").parquet(src)
    run_dedup_stream_to_table(spark, src, out, ckpt, delay="1 hour")
    before = sorted(
        (r.conv_id, r.turn_idx) for r in spark.read.parquet(out).collect()
    )

    # replay batch 0's payload into the same batch_id partition (what a
    # restarted query does when the checkpoint commit was lost).  In a real
    # replay the batch comes from the SOURCE; materialize to avoid the
    # read-self-overwrite lazy-plan artifact.
    batch0 = spark.read.parquet(os.path.join(out, "batch_id=0"))
    replay = spark.createDataFrame(batch0.collect(), batch0.schema)
    replay.write.mode("overwrite").parquet(os.path.join(out, "batch_id=0"))
    after = sorted(
        (r.conv_id, r.turn_idx) for r in spark.read.parquet(out).collect()
    )
    assert after == before
