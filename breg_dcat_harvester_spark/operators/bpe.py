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


MAX_VOCAB_ROWS = 2_000_000


def bpe_train_local(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    passes: int = DEFAULT_PASSES,
    max_vocab_rows: int = MAX_VOCAB_ROWS,
) -> list[tuple[int, str, str, int]]:
    """The real-scale trainer: ONE distributed corpus pass (the word-
    frequency agg — the only part whose cost grows with the corpus), then
    the classic heap trainer over the collected vocabulary RELATION.

    ``bpe_train`` runs one Spark job per merge — correct and oracle-
    replayable, but 30-50k production merges would mean 30-50k vocabulary-
    wide jobs.  The vocabulary is bounded (|distinct words|, not |tokens|:
    a few hundred thousand rows even for TB-scale English corpora), so
    after the single corpus pass it is collected driver-side under a
    guarded cap (the ``infer.py`` MAX_SCHEMA_EDGES pattern — loud failure,
    never silent truncation) and trained locally with an incremental
    pair-count heap: each round touches only the words containing the
    winning pair.  num_merges=1000 takes seconds.

    Bit-equal to ``bpe_train`` on the same input by construction: the same
    word-frequency relation, the same (count DESC, pair ASC) argmax, and
    the SAME ``passes``-bounded padded-replace rewrite applied per word —
    so the distributed form stays the oracle-gated twin and a unit test
    asserts merge-list equality.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vdf = _word_freqs(df, text_col)
    rows = vdf.take(max_vocab_rows + 1)
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"vocabulary exceeds max_vocab_rows={max_vocab_rows}; "
            "raise the cap explicitly or pre-filter the corpus"
        )
    freqs = {r["w"]: int(r["freq"]) for r in rows}
    return _train_from_freqs(freqs, num_merges, passes)


def _word_pair_counts(seg: str):
    from collections import Counter

    syms = seg.split(" ")
    return Counter(
        f"{syms[i]} {syms[i + 1]}" for i in range(len(syms) - 1)
    )


def _train_from_freqs(
    freqs: dict[str, int], num_merges: int, passes: int
) -> list[tuple[int, str, str, int]]:
    import heapq
    from collections import defaultdict

    segs = {w: " ".join(w) + " " + END for w in freqs}
    counts: dict[str, int] = defaultdict(int)
    index: dict[str, set] = defaultdict(set)
    for w, f in freqs.items():
        for p, c in _word_pair_counts(segs[w]).items():
            counts[p] += c * f
            index[p].add(w)
    heap = [(-c, p) for p, c in counts.items() if c > 0]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges and heap:
        negc, pair = heapq.heappop(heap)
        cur = counts.get(pair, 0)
        if cur != -negc:  # stale entry: re-enter at its current count
            if cur > 0:
                heapq.heappush(heap, (-cur, pair))
            continue
        if cur < 1:
            break
        merged = pair.replace(" ", "")
        merges.append((len(merges), pair, merged, cur))
        pat, rep = f" {pair} ", f" {merged} "
        touched: dict[str, int] = defaultdict(int)
        for w in list(index.get(pair, ())):
            seg = segs[w]
            old = _word_pair_counts(seg)
            s = f" {seg} "
            for _ in range(passes):
                s = s.replace(pat, rep)
            new_seg = s.strip()
            if new_seg == seg:
                continue
            segs[w] = new_seg
            new = _word_pair_counts(new_seg)
            f = freqs[w]
            for p in set(old) | set(new):
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    counts[p] += d * f
                    touched[p] = 1
                if new.get(p, 0) == 0:
                    index[p].discard(w)
                elif old.get(p, 0) == 0:
                    index[p].add(w)
        for p in touched:
            if counts[p] > 0:
                heapq.heappush(heap, (-counts[p], p))
    return merges


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, pair string, merged string, cnt long"
    )


MAX_CODEGEN_MERGES = 24


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    passes: int = DEFAULT_PASSES,
    max_codegen_merges: int = MAX_CODEGEN_MERGES,
) -> DataFrame:
    """Tokenize ``text_col`` under a trained merge list — map-only.

    Adds ``out_col``: array of BPE symbols for the whole text (words
    char-split + ``</w>``-terminated, merges applied in rank order).
    Zero shuffle at any corpus size; the merge list is a plan constant.

    Short merge lists compile to pure codegen'd Column rewrites; beyond
    ``max_codegen_merges`` the nested-replace expression tree would blow
    the JVM analyzer stack (a 1000-merge production vocabulary is 12k
    nested calls), so large lists switch to an Arrow-batched pandas UDF
    applying the SAME passes-bounded padded replace per DISTINCT word
    (memoized per batch — the rewrite cost is vocabulary-shaped, not
    corpus-shaped).  Both paths are value-identical; a unit test pins it.
    """
    if len(merges) <= max_codegen_merges:
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
    return _bpe_segment_arrow(df, merges, text_col, out_col, passes)


def _bpe_segment_arrow(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str,
    out_col: str,
    passes: int,
) -> DataFrame:
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merge_list = [(f" {p} ", f" {m} ") for _r, p, m, _c in merges]
    word_re = re.compile(WORD_SPLIT)

    def _seg(col):
        from breg_dcat_harvester_spark.functions.workerenv import (
            pin_native_threads,
        )

        pin_native_threads()
        cache: dict[str, list[str]] = {}

        def seg_word(w: str) -> list[str]:
            t = cache.get(w)
            if t is None:
                s = " " + " ".join(w) + " " + END + " "
                for pat, rep in merge_list:
                    for _ in range(passes):
                        if pat not in s:
                            break
                        s = s.replace(pat, rep)
                t = s.split()
                cache[w] = t
            return t

        def run(text: str) -> list[str]:
            out: list[str] = []
            for w in word_re.split(text.lower()):
                if w:
                    out.extend(seg_word(w))
            return out

        return col.map(lambda t: None if t is None else run(t))

    # module uses postponed annotation evaluation, so the Series hints the
    # pandas_udf inspector needs are attached explicitly
    _seg.__annotations__ = {"col": pd.Series, "return": pd.Series}
    seg = pandas_udf(_seg, "array<string>")
    return df.withColumn(out_col, seg(F.col(text_col)))


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
