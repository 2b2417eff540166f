"""Corpus-adaptive (model-based) quality scoring.

Static quality ratios (functions/textfns.py) catch structural garbage;
production pipelines ALSO score text against a language model trained on
the corpus itself — CCNet buckets documents by KenLM perplexity, Gopher and
RefinedWeb keep model-based filters in the same position.  A float
perplexity cannot be oracle-gated bit-exactly across engines (libm ``ln``
differs by ulps), so this scorer keeps the same *shape* — train on corpus,
score per document, bucket by score — with integer-exact arithmetic:

* ``train_char_bigram_model`` — ONE aggregation pass counting character
  bigrams corpus-wide; the model is the relation of bigrams whose count
  clears ``min_count`` (the "in-distribution" set).  Cardinality is bounded
  by charset² regardless of corpus size, so the model always broadcasts.
* ``lm_quality_score`` — per document, the per-mille of its bigrams found
  in the model ("familiarity": text full of rare character sequences —
  base64 blobs, mojibake, wrong-language spans — scores low).  The grams
  explode map-side, the model joins broadcast, and the per-doc rollup's
  map-side partial agg collapses each document back to one row before the
  shuffle (a document's grams never span partitions).

Everything is integer (counts and per-mille floor division), so the DuckDB
oracle replays scores bit-exactly — no epsilon gate needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)


def _bigrams(text_col: str):
    """Array of character bigrams of lower(text) — pure Column expr.

    The trailing length filter also guards the degenerate inputs: Spark's
    ``sequence(1, 0)`` is DESCENDING ``[1, 0]`` (not empty), so empty and
    one-char texts are clamped to one candidate position whose short gram
    the filter drops."""
    return F.expr(
        f"filter(transform(sequence(1, greatest(length(lower({text_col})) - 1, 1)),"
        f" i -> substring(lower({text_col}), i, 2)), g -> length(g) = 2)"
    )


def train_char_bigram_model(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Corpus bigram vocabulary -> (gram, cnt), cnt >= min_count.

    One explode + ONE map-side-combined groupBy; output is bounded by the
    square of the character set (a few thousand rows on natural text), so
    the scorer can always broadcast it."""
    grams = docs.select(F.explode(_bigrams(text_col)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def lm_quality_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained bigram model ->
    (doc_id, n_grams, common_per_mille).

    ``common_per_mille`` = floor(1000 * |grams in model| / |grams|) — the
    integer-exact stand-in for a per-character logprob.  Empty/one-char
    documents score 0 over 0 grams (kept, flagged by n_grams = 0).  The
    model side is broadcast; the per-doc agg's partial stage collapses
    each document in-partition, so the shuffle carries ~1 row/doc."""
    grams = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_bigrams(text_col)).alias("gram")
    )
    flagged = grams.join(
        F.broadcast(model.select("gram", F.lit(1).alias("known"))),
        "gram",
        "left",
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("known"), F.lit(0))).alias("_common"),
    )
    scored = per_doc.select(
        "doc_id",
        "n_grams",
        F.floor(F.lit(1000) * F.col("_common") / F.col("n_grams"))
        .cast("long")
        .alias("common_per_mille"),
    )
    # documents with no bigrams never reach the explode output; restore them
    empties = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(0).cast("long").alias("n_grams"),
            F.lit(0).cast("long").alias("common_per_mille"),
        )
    )
    return scored.unionByName(empties)


def lm_quality_report_materialized(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    keep_per_mille: int = 900,
    train_on: DataFrame | None = None,
    max_model_rows: int = 1_000_000,
    model_grams: frozenset | None = None,
) -> DataFrame:
    """The DEPLOYMENT shape of CCNet-style scoring: persist-then-score.

    Two separated stages, exactly like a production pipeline:

    1. Train ONCE — ``train_char_bigram_model`` makes its single
       aggregation pass over the trusted slice and the model (bounded by
       charset² regardless of corpus size) is collected to the driver as a
       PLAN CONSTANT.  The collect is guarded by ``max_model_rows``: a
       pathological corpus whose "charset" is unbounded (binary soup)
       fails loudly instead of OOMing the driver.
    2. Score in ONE corpus scan — an Arrow-batched ``mapInPandas`` kernel
       carries the model as a task broadcast and emits the per-document
       row directly: NO explode, NO join, NO shuffle.  At 100 TB this is
       a map-only stage over the documents table; the audit twin
       (``lm_quality_report``) re-derives the model inside one plan and
       pays an exploded-grams shuffle per document instead.

    Integer arithmetic is identical to the audit twin (count + per-mille
    floor division), so both forms gate on the same DuckDB oracle.

    Lifecycle notes: stage 1 (train + collect) re-runs on EVERY call — a
    deployment scoring many shards should train once and pass the
    collected set back via ``model_grams`` (skipping stage 1 entirely);
    the task broadcast created here lives until the session ends (it is
    referenced by the returned plan, so it cannot be destroyed eagerly —
    one charset²-bounded set per call).
    """
    if model_grams is None:
        model_df = train_char_bigram_model(
            train_on if train_on is not None else docs, text_col,
            min_count=min_count,
        )
        rows = model_df.select("gram").limit(max_model_rows + 1).collect()
        if len(rows) > max_model_rows:
            raise ValueError(
                f"bigram model exceeds max_model_rows={max_model_rows}; "
                "the corpus character set is not bounded enough to broadcast"
            )
        model_grams = frozenset(r["gram"] for r in rows)
    bc = docs.sparkSession.sparkContext.broadcast(model_grams)

    id_field = docs.schema[id_col]
    out_schema = StructType([
        StructField("doc_id", id_field.dataType, id_field.nullable),
        StructField("n_grams", LongType(), False),
        StructField("common_per_mille", LongType(), False),
        StructField("keep", BooleanType(), False),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from breg_dcat_harvester_spark.functions.workerenv import (
            pin_native_threads,
        )

        pin_native_threads()
        m = bc.value
        for pdf in batches:
            n_grams, per_mille, keep = [], [], []
            for t in pdf[text_col]:
                t = (t or "").lower()
                k = len(t) - 1
                if k <= 0:
                    n_grams.append(0)
                    per_mille.append(0)
                    keep.append(False)
                    continue
                c = sum(1 for i in range(k) if t[i:i + 2] in m)
                n_grams.append(k)
                pm = 1000 * c // k
                per_mille.append(pm)
                keep.append(pm >= keep_per_mille)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_grams": pd.array(n_grams, dtype="int64"),
                "common_per_mille": pd.array(per_mille, dtype="int64"),
                "keep": pd.array(keep, dtype="boolean"),
            })

    return docs.select(id_col, text_col).mapInPandas(score, schema=out_schema)


def lm_quality_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    keep_per_mille: int = 900,
    train_on: DataFrame | None = None,
) -> DataFrame:
    """Train-and-score in one plan -> (doc_id, n_grams, common_per_mille,
    keep) — the CCNet-style head/tail decision row.

    ``train_on`` is the trusted reference slice (CCNet trains its KenLM on
    Wikipedia, not on the crawl being scored); default is in-corpus
    training.  The model subplan aggregates the same exploded grams the
    scorer reads; at 100 TB one would persist the model once (it is
    charset²-bounded) and reuse it across scoring runs —
    ``train_char_bigram_model`` is separable for exactly that."""
    model = train_char_bigram_model(
        train_on if train_on is not None else docs, text_col,
        min_count=min_count,
    )
    scored = lm_quality_score(docs, model, id_col=id_col, text_col=text_col)
    return scored.select(
        "doc_id",
        "n_grams",
        "common_per_mille",
        (
            (F.col("n_grams") > 0)
            & (F.col("common_per_mille") >= keep_per_mille)
        ).alias("keep"),
    )
