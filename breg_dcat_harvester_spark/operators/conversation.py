"""Per-conversation grouped analysis — the applyInPandas surface (§2.9).

The UDAF analog in this engine is ``groupBy('conv_id').applyInPandas``: each
conversation arrives as one pandas frame in stable (conv_id, turn_idx) order
(sorted inside the kernel — the W5 invariant), so order-dependent dialogue
features (role transitions, inter-turn gaps, mention density) are computed
vectorized per group with zero per-row Python.

``conversation_stats`` is deliberately SQL-expressible (window functions) so
the DuckDB oracle can gate it; heavier order-dependent kernels (dialogue
segmentation, coreference chains) plug into the same shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

STATS_SCHEMA = (
    "conv_id string, n_turns long, n_roles long, n_role_changes long, "
    "n_tool_turns long, n_mentions long, span_seconds long"
)


def _stats_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    from breg_dcat_harvester_spark.functions.workerenv import pin_native_threads
    pin_native_threads()

    pdf = pdf.sort_values("turn_idx")  # W5: stable turn ordering
    roles = pdf["role"]
    mentions = pdf["text"].str.count(r"\[\[").fillna(0)
    span = (
        (pdf["ts"].max() - pdf["ts"].min()).total_seconds()
        if pdf["ts"].notna().any()
        else 0
    )
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "n_turns": [len(pdf)],
            "n_roles": [roles.nunique()],
            "n_role_changes": [int((roles != roles.shift()).iloc[1:].sum())],
            "n_tool_turns": [int(pdf["tool"].notna().sum())],
            "n_mentions": [int(mentions.sum())],
            "span_seconds": [int(span)],
        }
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """One row per conversation with order-dependent dialogue features."""
    return transcripts.groupBy("conv_id").applyInPandas(_stats_kernel, STATS_SCHEMA)


def tool_cooccurrence(transcripts: DataFrame) -> DataFrame:
    """(tool_a, tool_b, n_convs): tools used together in one conversation.

    Co-occurrence graphs are the standard projection for "which tools/agents
    appear together" questions over agent transcripts.  Shape: ONE distinct
    shuffle on (conv_id, tool), then per-conversation in-array pairing (the
    same no-self-join pattern as the LSH bucket pairing in dedup.py) — the
    pair explosion is bounded by the per-conversation distinct-tool count
    (tens at most by construction of a dialogue), never by corpus size, so
    there is no hot-key wedge problem; the final count agg is map-side
    partial on the (tool_a, tool_b) key.
    """
    from pyspark.sql import functions as F

    per_conv = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "tool")
        .distinct()
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_set("tool")).alias("tools"))
    )
    pairs = per_conv.select(
        F.explode(
            F.expr(
                "flatten(transform(tools, (x, i) -> "
                "transform(slice(tools, i + 2, size(tools)), "
                "y -> struct(x AS tool_a, y AS tool_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.tool_a", "p.tool_b")
        .groupBy("tool_a", "tool_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_convs"))
    )


def sft_pairs(
    transcripts: DataFrame,
    context_turns: int = 4,
    min_completion_chars: int = 1,
) -> DataFrame:
    """Prompt/completion pairs for supervised fine-tuning ->
    (conv_id, turn_idx, prompt, completion, n_context_turns).

    One pair per assistant turn with at least one preceding turn: the
    completion is the assistant text, the prompt the last ``context_turns``
    preceding turns rendered as ``role: text`` lines (tool turns render as
    ``tool[name]: text``) in stable turn order — the W5 invariant again.

    Scale shape: ONE hash-partition shuffle on conv_id; the context window
    is a bounded ROWS frame (``context_turns PRECEDING .. 1 PRECEDING``)
    over an incremental WindowExec, so cost is O(turns x context_turns)
    worst case and the full-history quadratic blowup of naive pair
    construction never happens.  Capped context is also what an SFT
    pipeline actually emits (the tokenizer budget is finite)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    line = F.concat_ws(
        ": ",
        F.when(
            F.col("tool").isNotNull(),
            F.concat(F.col("role"), F.lit("["), F.col("tool"), F.lit("]")),
        ).otherwise(F.col("role")),
        F.coalesce(F.col("text"), F.lit("")),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    with_ctx = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.collect_list(line.alias("line")).over(w).alias("_ctx"),
    )
    return (
        with_ctx.filter(
            (F.col("role") == "assistant")
            & (F.size("_ctx") > 0)
            & (F.length(F.coalesce(F.col("text"), F.lit(""))) >= min_completion_chars)
        )
        .select(
            "conv_id",
            "turn_idx",
            F.concat_ws("\n", F.col("_ctx")).alias("prompt"),
            F.col("text").alias("completion"),
            F.size("_ctx").cast("long").alias("n_context_turns"),
        )
    )


def conversation_fingerprints(transcripts: DataFrame) -> DataFrame:
    """Order-sensitive conversation content fingerprint ->
    (conv_id, n_turns, fp).

    fp = sha256 over the turns serialized in stable (turn_idx) order as
    ``idx\\x1frole\\x1ftext`` records joined by ``\\x1e`` — byte-identical
    conversations (same turns, same order, same roles) collide, reordered
    or edited ones do not.  ONE conv_id shuffle; the per-conv array is the
    conversation itself (bounded by turns-per-conversation, not corpus
    size)."""
    from pyspark.sql import functions as F

    rec = F.struct(
        F.col("turn_idx"),
        F.concat_ws(
            "\x1f",
            F.col("turn_idx").cast("string"),
            F.coalesce(F.col("role"), F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
        ).alias("line"),
    )
    return (
        transcripts.groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(rec)).alias("_recs"))
        .select(
            "conv_id",
            F.size("_recs").cast("long").alias("n_turns"),
            F.sha2(
                F.concat_ws(
                    "\x1e", F.transform(F.col("_recs"), lambda r: r["line"])
                ),
                256,
            ).alias("fp"),
        )
    )


def conversation_dup_groups(
    transcripts: DataFrame, sample_k: int = 8
) -> DataFrame:
    """Groups of byte-identical conversations ->
    (fp, n_convs, canonical_conv_id, sample_ids).

    The conversation-granularity exact dedup (retried agent sessions,
    re-ingested logs).  Bounded per-group output like
    ``dedup.exact_dup_groups``: the canonical id is the smallest conv_id,
    ``sample_ids`` the ``sample_k`` smallest, comma-joined."""
    from pyspark.sql import functions as F

    fps = conversation_fingerprints(transcripts)
    return (
        fps.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.min("conv_id").alias("canonical_conv_id"),
            F.concat_ws(
                ",",
                F.slice(F.array_sort(F.collect_list("conv_id")), 1, sample_k),
            ).alias("sample_ids"),
        )
        .filter(F.col("n_convs") > 1)
    )
