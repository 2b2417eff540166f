"""Sequence packing + deterministic corpus sharding (training-data ops).

LM pretraining consumes fixed-length token sequences.  The standard recipe
(GPT-2/3, LLaMA) concatenates every document in a stratum in a stable order
and cuts the token stream at ``seq_len`` boundaries — documents straddle
pack boundaries.  The per-doc placement is therefore a *prefix sum* of
token counts in (stratum, doc_id) order:

    global_start(d) = sum(n_tokens of docs before d in its stratum)
    pack_id(d)      = floor(global_start / seq_len)
    pack_offset(d)  = global_start % seq_len
    n_packs(d)      = floor((global_start + n_tokens - 1)/seq_len)
                      - pack_id + 1

* ``pack_sequences`` computes this with a **distributed prefix sum** —
  the single-window form (``Window.partitionBy(stratum)``) puts an entire
  stratum on ONE reducer, which dies on a 90%-one-language 100 TB corpus.
  Instead: a range repartition on (stratum, doc_id) makes partitions
  contiguous runs of the global order; a window inside (partition, stratum)
  computes local prefix sums in parallel; per-(partition, stratum) totals —
  a P x L-row sliver — get their own cross-partition prefix via a window
  over that sliver only; a broadcast join adds the base offsets back.
  Every heavy step is parallel and bounded by partition size, not stratum
  size.  (``tests/test_packing.py`` proves the output identical to the
  single-window form.)

* ``shuffle_shards`` assigns every doc a deterministic pseudo-random shard
  (training-order shuffle): shard = sha256-bucket of (seed, doc_id) —
  map-only, zero shuffle, identical on re-run/resume at any parallelism,
  and bit-exactly replayable by any engine (the DuckDB oracle does).
  Within-shard order is the hash itself, so iterating a shard in
  ``sort_key`` order is a uniform random permutation of the corpus.

Tokens are whitespace-split words here (the sandbox has no tokenizer); the
token counter is a hook — swap ``n_tokens_expr`` for a real BPE count
column without touching the packing math.

Reference parity note: the reference has no packing analog (it harvests
complete RDF sources); this family belongs to the "operations a
large-scale training-data pipeline would need" mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def default_token_count(text: Column) -> Column:
    """Whitespace-word count; matches DuckDB len(string_split(text, ' '))."""
    return F.size(F.split(text, " "))


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    text_col: str = "text",
    n_tokens_expr: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concatenate-and-cut packing placement per document.

    Returns (doc_id, stratum, n_tokens, pack_id, pack_offset, n_packs):
    the pack holding the doc's first token, the offset inside that pack,
    and how many consecutive packs the doc spans.  Packs never cross
    stratum boundaries; docs are laid out in ascending doc_id order within
    each stratum (the deterministic total order the north_rule requires of
    resume/re-run).
    """
    n_tok = (
        n_tokens_expr if n_tokens_expr is not None else default_token_count(F.col(text_col))
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        n_tok.alias("n_tokens"),
    )
    if num_partitions:
        base = base.repartitionByRange(num_partitions, "stratum", "doc_id")
    else:
        base = base.repartitionByRange("stratum", "doc_id")
    part = base.withColumn("_pid", F.spark_partition_id())

    # Local (within partition x stratum) EXCLUSIVE prefix sum — parallel,
    # bounded by partition size.  The window's hash exchange on
    # (_pid, stratum) is balanced by construction: each group is a subset
    # of one range partition.
    w_loc = (
        Window.partitionBy("_pid", "stratum")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn(
        "_local_start", F.sum("n_tokens").over(w_loc) - F.col("n_tokens")
    )

    # Cross-partition base offsets: one row per (pid, stratum) — a sliver
    # (O(partitions x strata)); its own exclusive prefix sum over pid order
    # runs on that sliver only, then rides back in as a broadcast join.
    sliver = local.groupBy("_pid", "stratum").agg(
        F.sum("n_tokens").alias("_part_total")
    )
    w_base = (
        Window.partitionBy("stratum")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = sliver.withColumn(
        "_base", F.sum("_part_total").over(w_base) - F.col("_part_total")
    ).select("_pid", "stratum", "_base")

    placed = local.join(F.broadcast(bases), ["_pid", "stratum"]).withColumn(
        "_gstart", F.col("_base") + F.col("_local_start")
    )
    return placed.select(
        "doc_id",
        "stratum",
        "n_tokens",
        F.floor(F.col("_gstart") / seq_len).alias("pack_id"),
        (F.col("_gstart") % seq_len).alias("pack_offset"),
        (
            F.floor((F.col("_gstart") + F.col("n_tokens") - 1) / seq_len)
            - F.floor(F.col("_gstart") / seq_len)
            + 1
        ).alias("n_packs"),
    )


def pack_sequences_single_window(
    docs: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Reference form: one window per stratum (the shape the oracle uses).

    Correct but NOT scale-safe — a dominant stratum lands on one reducer.
    Kept as the equivalence baseline for tests; production uses
    ``pack_sequences``.
    """
    n_tok = default_token_count(F.col(text_col)).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("stratum")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = base.withColumn("_gstart", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return g.select(
        "doc_id",
        "stratum",
        "n_tokens",
        F.floor(F.col("_gstart") / seq_len).alias("pack_id"),
        (F.col("_gstart") % seq_len).alias("pack_offset"),
        (
            F.floor((F.col("_gstart") + F.col("n_tokens") - 1) / seq_len)
            - F.floor(F.col("_gstart") / seq_len)
            + 1
        ).alias("n_packs"),
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 32,
    seed: str = "shuf",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic training-order shuffle: (doc_id, shard_id, sort_key).

    shard_id = sha256-bucket(seed:doc_id) % n_shards (sampling.sample_bucket
    recipe — engine-replayable); sort_key = the full hash hex, giving a
    uniform random within-shard order.  Pure map-side projection: zero
    shuffle, resumable, identical at any parallelism.  Write with
    ``partitionBy('shard_id')`` + ``sortWithinPartitions('sort_key')`` for
    ready-to-stream training shards.
    """
    from .sampling import bucket_hash, sample_bucket

    h = bucket_hash(F.col(id_col), salt=seed)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        sample_bucket(F.col(id_col), salt=seed, buckets=n_shards, alias="shard_id"),
        h.alias("sort_key"),
        default_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )


def shard_manifest(shards: DataFrame) -> DataFrame:
    """Per-shard manifest: row/token counts + order checksum endpoints."""
    return shards.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("sort_key").alias("first_key"),
        F.max("sort_key").alias("last_key"),
    )


def pack_manifest(placed: DataFrame, seq_len: int = 512) -> DataFrame:
    """Explode packing placements into the per-pack segment table a
    training reader consumes: (stratum, pack_id, doc_id, pack_start,
    doc_start, n_toks) — "pack p takes doc d's tokens
    [doc_start, doc_start+n_toks) at offset pack_start".

    Pure map-side explode of each doc's spanned pack range (no shuffle on
    top of ``pack_sequences``); segments tile every pack exactly
    [0, seq_len) except each stratum's final pack (asserted in tests).
    ``placed`` is the output of ``pack_sequences`` (or the single-window
    form) with the SAME seq_len.
    """
    p = F.col("p")
    first = p == F.col("pack_id")
    pack_start = F.when(first, F.col("pack_offset")).otherwise(F.lit(0))
    doc_start = F.when(first, F.lit(0)).otherwise(
        (F.lit(seq_len) - F.col("pack_offset"))
        + (p - F.col("pack_id") - 1) * seq_len
    )
    exploded = placed.select(
        "stratum",
        "doc_id",
        "n_tokens",
        "pack_id",
        "pack_offset",
        F.explode(
            F.sequence(
                F.col("pack_id"), F.col("pack_id") + F.col("n_packs") - 1
            )
        ).alias("p"),
    )
    return exploded.select(
        "stratum",
        p.alias("pack_id"),
        "doc_id",
        pack_start.cast("long").alias("pack_start"),
        doc_start.cast("long").alias("doc_start"),
        F.least(
            F.lit(seq_len) - pack_start, F.col("n_tokens") - doc_start
        ).cast("long").alias("n_toks"),
    )


def sft_pack_masks(
    pairs: DataFrame,
    seq_len: int = 512,
) -> DataFrame:
    """Loss-mask manifest for packed SFT training ->
    (pack_id, doc_id, mask_start, mask_len).

    Input is ``conversation.sft_pairs`` output; each pair becomes the
    concatenated sequence ``prompt ++ completion`` (whitespace token
    counts), packed with the standard concatenate-and-cut placement.  The
    manifest rows mark, per pack, the spans the loss should COVER — the
    completion tokens only (prompt/context tokens are masked out), split
    across packs exactly like the underlying segments.  This is the
    artifact an SFT dataloader consumes next to ``pack_manifest``.

    Shape: the pair table packs via the distributed prefix sum, segments
    explode map-side, and one equi-join back on the pair id attaches the
    prompt/total counts for the span intersection — all Column math, no
    Python."""
    base = pairs.select(
        F.concat_ws(
            "#", F.col("conv_id"), F.col("turn_idx").cast("string")
        ).alias("doc_id"),
        F.lit("sft").alias("stratum"),
        default_token_count(F.col("prompt")).cast("long").alias("n_prompt"),
        (
            default_token_count(F.col("prompt"))
            + default_token_count(F.col("completion"))
        ).cast("long").alias("n_total"),
    )
    placed = pack_sequences(
        base,
        seq_len=seq_len,
        id_col="doc_id",
        stratum_col="stratum",
        n_tokens_expr=F.col("n_total"),
    )
    segs = pack_manifest(placed, seq_len=seq_len)
    joined = segs.join(base.select("doc_id", "n_prompt", "n_total"), "doc_id")
    istart = F.greatest(F.col("doc_start"), F.col("n_prompt"))
    iend = F.least(F.col("doc_start") + F.col("n_toks"), F.col("n_total"))
    return (
        joined.filter(iend > istart)
        .select(
            "pack_id",
            "doc_id",
            (F.col("pack_start") + istart - F.col("doc_start"))
            .cast("long")
            .alias("mask_start"),
            (iend - istart).cast("long").alias("mask_len"),
        )
    )
