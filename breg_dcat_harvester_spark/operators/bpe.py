"""Distributed BPE tokenizer training (ours — training-data pipeline).

A pretraining pipeline trains its tokenizer ON the corpus it curates
(GPT-2's BPE, Sennrich et al. 2015).  The classic trainer is single-machine
(a dict of word frequencies + a heap); the Spark-shaped equivalent
exploits the same structural fact the classic one does: after ONE corpus
pass that aggregates word frequencies, training never touches the corpus
again — every merge round runs on the VOCABULARY relation (|distinct
words|, not |tokens|), weighted by frequency.

Dataflow per round (``bpe_train``):

1. adjacent symbol pairs are computed IN-ARRAY per vocab row (map-side
   ``transform``), weighted by word frequency, and summed in one
   map-side-combined hash-agg — the only shuffle, vocabulary-sized;
2. the argmax pair (count DESC, pair ASC — fully deterministic) is
   collected to the driver: ONE row per round, the same plan-constant
   pattern as the IVF/PQ centroid training;
3. the merge applies to every vocab row map-side via the GUARDED padded
   string replace: segmentations are space-joined symbol strings, the
   pattern ``' a b '`` keeps a symbol boundary on each side so a pair can
   never match across symbols (the classic replace-without-guards bug),
   and the replace runs ``passes`` times because one left-to-right pass
   skips every other occurrence of an overlapping chain (``a a a a``).
   ``passes`` bounds the mergeable chain length (exact for words up to
   ~``passes`` repeated symbols; longer chains under-merge DETERMINISTICALLY
   and identically in every engine — both sides of the oracle gate compute
   the same variant).  Fixpoint order is leftmost-first, the greedy BPE
   order.

Everything is bit-deterministic at any parallelism: integer frequency
sums, lexical tie-breaks, and string rewrites — a DuckDB oracle replays
whole training rounds (scalar-subquery argmax + the same replace chain).

``bpe_segment`` applies a trained merge list to any text column map-side
(zero shuffle): chars -> the same guarded replace per merge, in rank
order.  ``</w>`` marks word ends so learned tokens don't leak across
word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SPLIT = "[^a-z0-9]+"
END = "</w>"
DEFAULT_PASSES = 12


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), WORD_SPLIT)).alias("w")
    ).filter(F.col("w") != "")
    return words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("freq"))


def _initial_seg(w) -> F.Column:
    # 'cat' -> 'c a t </w>' (Spark split('', '') yields chars, no empties
    # except a trailing one on some versions — filter to be safe)
    chars = F.filter(F.split(w, ""), lambda x: x != "")
    return F.concat(F.array_join(chars, " "), F.lit(" " + END))


def _merge_seg(seg, pair: str, passes: int):
    """Apply one merge to a space-joined symbol string, boundary-guarded."""
    merged = pair.replace(" ", "")
    out = F.concat(F.lit(" "), seg, F.lit(" "))
    for _ in range(passes):
        out = F.replace(out, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return F.trim(out)


def bpe_train(
    df: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    passes: int = DEFAULT_PASSES,
    checkpoint_interval: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Train ``num_merges`` BPE merges -> [(rank, pair, merged, count)].

    The returned list is a plan constant (like IVF centroids / PQ
    codebooks): feed it to ``bpe_segment`` to tokenize any corpus, or
    materialize it as a one-row-per-merge table.  The corpus is scanned
    ONCE (the word-frequency agg); each round's work is vocabulary-sized.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = (
        _word_freqs(df, text_col)
        .select("w", "freq", _initial_seg(F.col("w")).alias("seg"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(num_merges):
        syms = F.split(F.col("seg"), " ")
        # guard: a fully-merged word has ONE symbol — sequence(0, -1)
        # would count DOWN in Spark and index element 0 (1-based: error)
        adjacent = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(syms) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(syms, i + 1),
                    F.element_at(syms, i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pairs = vocab.select(
            "freq", F.explode(adjacent).alias("p")
        ).groupBy("p").agg(F.sum("freq").cast("long").alias("cnt"))
        best = pairs.orderBy(F.col("cnt").desc(), F.col("p").asc()).head()
        if best is None or best.cnt < 1:
            break
        pair, cnt = best.p, int(best.cnt)
        merges.append((r, pair, pair.replace(" ", ""), cnt))
        vocab = vocab.withColumn(
            "seg", _merge_seg(F.col("seg"), pair, passes)
        )
        if (r + 1) % checkpoint_interval == 0 and r + 1 < num_merges:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, pair string, merged string, cnt long"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    passes: int = DEFAULT_PASSES,
) -> DataFrame:
    """Tokenize ``text_col`` under a trained merge list — map-only.

    Adds ``out_col``: array of BPE symbols for the whole text (words
    char-split + ``</w>``-terminated, merges applied in rank order).
    Zero shuffle at any corpus size; the merge list is a plan constant.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT), lambda x: x != ""
    )

    def seg_word(w):
        seg = _initial_seg(w)
        for _rank, pair, _merged, _cnt in merges:
            seg = _merge_seg(seg, pair, passes)
        return seg

    joined = F.array_join(F.transform(words, seg_word), " ")
    return df.withColumn(
        out_col,
        F.filter(F.split(joined, " "), lambda x: x != ""),
    )


def oracle_bpe_sql(
    documents_rel: str,
    num_merges: int = 8,
    passes: int = DEFAULT_PASSES,
) -> str:
    """DuckDB replay of the ENTIRE training loop: per round, a pair-count
    CTE, a LIMIT-1 argmax (same (cnt DESC, pair ASC) tie-break), and the
    same guarded ``passes``-deep replace chain applied via a CROSS JOIN
    with the one-row argmax.  Output = the merge table, hash-exact."""
    head = f"""
WITH w0 AS (
    SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '{WORD_SPLIT}')) AS w
        FROM {documents_rel}
    ) WHERE w <> '' GROUP BY w
),
v0 AS (
    SELECT w, freq,
           array_to_string(regexp_split_to_array(w, ''), ' ') || ' {END}' AS seg
    FROM w0
)"""
    rounds = []
    for k in range(1, num_merges + 1):
        chain = f"' ' || v.seg || ' '"
        for _ in range(passes):
            chain = (
                f"replace({chain}, ' ' || b.p || ' ', "
                f"' ' || replace(b.p, ' ', '') || ' ')"
            )
        rounds.append(f""",
p{k} AS (
    SELECT s.p, CAST(SUM(s.freq) AS BIGINT) AS cnt FROM (
        SELECT t.freq, t.syms[g.i] || ' ' || t.syms[g.i + 1] AS p
        FROM (SELECT freq, string_split(seg, ' ') AS syms FROM v{k - 1}) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.syms) - 1)) AS i) g
    ) s GROUP BY s.p
),
b{k} AS (SELECT p, cnt FROM p{k} ORDER BY cnt DESC, p ASC LIMIT 1),
v{k} AS (
    SELECT v.w, v.freq, trim({chain}) AS seg
    FROM v{k - 1} v CROSS JOIN b{k} b
)""")
        # NB: v{k} is only consulted by round k+1's pair counts; the final
        # SELECT reads just the argmax rows
    tail = "\nUNION ALL\n".join(
        f"SELECT CAST({k - 1} AS INT) AS rank, p AS pair, "
        f"replace(p, ' ', '') AS merged, cnt FROM b{k}"
        for k in range(1, num_merges + 1)
    )
    return head + "".join(rounds) + "\n" + tail
