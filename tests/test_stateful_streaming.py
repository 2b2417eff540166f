"""applyInPandasWithState: per-conversation running totals across
micro-batches (state survives batch boundaries via the checkpoint)."""

from pyspark.sql import functions as F

from breg_dcat_harvester_spark.schema import TRANSCRIPTS
from breg_dcat_harvester_spark.streaming.stateful import (
    streaming_conversation_totals,
)


def test_stateful_running_totals(spark, tmp_path, small_transcripts):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # two separate input files -> maxFilesPerTrigger=1 forces two batches,
    # so per-conversation state must carry across batches
    half = small_transcripts.filter("turn_idx % 2 = 0")
    other = small_transcripts.filter("turn_idx % 2 = 1")
    half.coalesce(1).write.parquet(str(src / "a"))
    other.coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        streaming_conversation_totals(stream)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    # the LAST emitted row per conversation equals the batch ground truth
    last = (
        got.groupBy("conv_id")
        .agg(F.max(F.struct("n_turns", "n_mentions", "max_turn_idx")).alias("s"))
        .select("conv_id", "s.n_turns", "s.n_mentions", "s.max_turn_idx")
    )
    truth = small_transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(r"\[\[([^\[\]]+)\]\]"), F.lit(1)))).alias(
            "n_mentions"
        ),
        F.max("turn_idx").alias("max_turn_idx"),
    )
    g = {r.conv_id: (r.n_turns, r.n_mentions, r.max_turn_idx) for r in last.collect()}
    t = {r.conv_id: (r.n_turns, r.n_mentions, r.max_turn_idx) for r in truth.collect()}
    assert g == t
