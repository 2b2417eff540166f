"""Benchmark decontamination (training-data pipeline operator).

Training corpora must be scrubbed of evaluation data before training: a
document that shares long word n-grams with a benchmark/eval set inflates
downstream scores.  The standard public method (GPT-3 appendix C / The Pile
/ Dolma) is n-gram collision: flag a training document if any of its word
n-grams also appears in the eval set (13-grams for GPT-3; configurable here
— the synthetic corpus has short docs, so the contract query uses n=8).

Scale shape (the part that matters at 100 TB):

* The benchmark side is TINY relative to the corpus (eval sets are KB-MB
  even when the training side is 100 TB).  Its distinct n-grams are
  broadcast, so the corpus side is a MAP-ONLY scan + broadcast hash join —
  the corpus is never shuffled.
* The only shuffle is the per-document aggregation of hits, whose input is
  already filtered to colliding grams (a sliver of the corpus).
* Deterministic and idempotent: no sampling, no randomness; re-running on a
  resumed cluster flags the same rows.

The reference has no eval-set concept (it harvests complete registries);
this operator belongs to the "operations a large-scale training-data
pipeline would need" mandate, alongside dedup.py and sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _docs, word_shingles


def benchmark_ngrams(
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shingle, bench_id) — distinct word-n-grams of the eval set.

    Computed once and broadcast by the consumers below; at production scale
    persist this to a small parquet and reuse it across corpus shards.
    """
    return (
        word_shingles(_docs(benchmark, id_col, text_col), n=n)
        .select("shingle", F.col("doc_id").alias("bench_id"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination report vs an eval/benchmark table.

    Returns (doc_id, n_hit_ngrams, n_bench_docs) for every training doc
    sharing >= ``min_hits`` distinct word n-grams with the benchmark:
    n_hit_ngrams = how many of the doc's distinct n-grams collide,
    n_bench_docs = how many distinct benchmark docs it collides with.

    Plan: benchmark grams (small) -> distinct -> BROADCAST hash join against
    the corpus n-gram explode (map-side; zero corpus shuffle) -> one
    aggregation over the colliding sliver.  Both countDistincts share one
    expand — still bounded by the hit set, not the corpus.
    """
    bench = benchmark_ngrams(
        benchmark, n=n, id_col=bench_id_col, text_col=bench_text_col
    )
    if broadcast_bench:
        bench = F.broadcast(bench)
    grams = word_shingles(_docs(docs, id_col, text_col), n=n)
    return (
        grams.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").cast("long").alias("n_hit_ngrams"),
            F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
        )
        .filter(F.col("n_hit_ngrams") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """The corpus minus contaminated documents (left anti join on the
    report's doc_ids — the report side is small, so it broadcasts too)."""
    flagged = contamination_report(
        docs, benchmark, n=n, min_hits=min_hits,
        id_col=id_col, text_col=text_col, **kwargs,
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
