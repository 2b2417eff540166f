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
