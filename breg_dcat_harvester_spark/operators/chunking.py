"""Document chunking (RAG / embedding-index preparation).

Long documents are embedded and indexed as overlapping fixed-size token
windows; every RAG and retrieval pipeline has this step in front of the
encoder.  ``chunk_documents`` is a pure map-side explode — zero shuffle,
full predicate/column pushdown, trivially parallel at any corpus size —
and bit-deterministic: chunk boundaries derive only from the whitespace
token sequence (the same ``len(string_split(text, ' '))`` convention as
packing), so the DuckDB oracle replays every chunk byte-for-byte.

Reference parity note: the reference has no chunker (it harvests whole RDF
documents); this belongs to the training-data/retrieval operator mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunks ->
    (doc_id, chunk_idx, chunk_start, n_toks, chunk_text).

    Windows start at multiples of ``stride = chunk_tokens - overlap`` while
    the start lies inside the document; the final window may be short
    (standard sliding-window semantics — no token is dropped, consecutive
    chunks share ``overlap`` tokens).  One row per chunk, chunk_idx dense
    from 0 in document order."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        n.alias("_n"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_start") + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_start"))
        .cast("long")
        .alias("n_toks"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
