"""Distributed BPE training/segmentation (operators/bpe.py) — vocabulary-
relation training, plan-constant merges, guarded replace application."""

import pytest

from breg_dcat_harvester_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_classic_sennrich_merges(corpus):
    m = bpe_train(corpus, num_merges=4)
    # (rank, pair, merged, weighted count)
    assert m[0] == (0, "l o", "lo", 7)   # low*5 + lower*2
    assert m[1] == (1, "lo w", "low", 7)
    assert m[2] == (2, "e s", "es", 6)   # newest*5 + widest*1
    assert m[3] == (3, "es t", "est", 6)


def test_deterministic_any_parallelism(spark, corpus):
    a = bpe_train(corpus.repartition(1), num_merges=6)
    b = bpe_train(corpus.repartition(7), num_merges=6)
    assert a == b


def test_segment_applies_merges_in_order(corpus):
    m = bpe_train(corpus, num_merges=6)
    out = {r.doc_id: r.bpe_tokens for r in bpe_segment(corpus, m).collect()}
    # 'low' fully merges; 'newest' becomes n + ew + est</w>
    assert out[1][:2] == ["low", "</w>"]
    assert "est</w>" in out[3]
    # no token ever spans a word boundary: </w> count == word count
    n_words = len("newest newest newest widest".split())
    assert sum(1 for t in out[3] if t.endswith("</w>")) == n_words


def test_overlapping_chain_left_greedy(spark):
    df = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    m = bpe_train(df, num_merges=1)
    assert m[0][1] == "a a"
    out = bpe_segment(df, m).head().bpe_tokens
    # left-greedy: aaaa -> [aa, aa], aaa -> [aa, a]
    assert out == ["aa", "aa", "</w>", "aa", "a", "</w>"]


def test_merge_never_crosses_symbol_boundary(spark):
    # after 'a b'->'ab', the pair ('b','c') must not match inside 'ab c'
    df = spark.createDataFrame(
        [(1, "ab ab ab abc")], "doc_id long, text string"
    )
    m = bpe_train(df, num_merges=2)
    # first merge is 'a b' (4 occurrences)
    assert m[0][1] == "a b"
    segd = bpe_segment(df, m[:1]).head().bpe_tokens
    assert segd == ["ab", "</w>"] * 3 + ["ab", "c", "</w>"]


def test_empty_and_short_inputs(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    m = bpe_train(df, num_merges=3)
    # only pair available is 'x </w>'; later rounds run dry and stop
    assert m[0][1] == "x </w>"
    assert len(m) == 1


def test_local_trainer_equals_distributed(corpus, small_transcripts):
    from breg_dcat_harvester_spark.operators.bpe import bpe_train_local

    assert bpe_train_local(corpus, num_merges=6) == bpe_train(corpus, num_merges=6)
    # and on a real synthetic corpus slice (vocab-scale input)
    docs = small_transcripts.limit(200).selectExpr("conv_id", "text")
    assert (
        bpe_train_local(docs, num_merges=12)
        == bpe_train(docs, num_merges=12)
    )


def test_local_trainer_scales_to_thousands_of_merges(small_transcripts):
    import time

    from breg_dcat_harvester_spark.operators.bpe import bpe_train_local

    docs = small_transcripts.selectExpr("conv_id", "text")
    t0 = time.monotonic()
    m = bpe_train_local(docs, num_merges=1000)
    elapsed = time.monotonic() - t0
    # trainer either completes 1000 merges or exhausts the vocabulary;
    # the local phase itself is seconds, not one Spark job per merge
    assert len(m) == 1000 or all(c >= 1 for *_x, c in m)
    assert elapsed < 120
    assert [r for r, *_ in m] == list(range(len(m)))
    # applying a 1000-merge list stays a map-only plan constant
    out = bpe_segment(docs.limit(5), m[:200]).collect()
    assert all(r.bpe_tokens for r in out if r.text.strip())


def test_local_trainer_vocab_cap(spark):
    from breg_dcat_harvester_spark.operators.bpe import bpe_train_local

    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(50)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_local(df, num_merges=2, max_vocab_rows=10)


def test_segment_arrow_path_equals_codegen(corpus):
    from breg_dcat_harvester_spark.operators.bpe import bpe_train_local

    m = bpe_train_local(corpus, num_merges=6)
    a = bpe_segment(corpus, m).orderBy("doc_id").collect()
    b = bpe_segment(corpus, m, max_codegen_merges=0).orderBy("doc_id").collect()
    assert [r.bpe_tokens for r in a] == [r.bpe_tokens for r in b]


# --- property fuzz: incremental heap trainer == naive per-round recount ---


def _naive_train(freqs, num_merges, passes):
    """Reference semantics: full recount + argmax + passes-replace per
    round (what bpe_train computes distributed)."""
    from collections import Counter

    from breg_dcat_harvester_spark.operators.bpe import END

    segs = {w: " ".join(w) + " " + END for w in freqs}
    merges = []
    for r in range(num_merges):
        counts = Counter()
        for w, f in freqs.items():
            syms = segs[w].split(" ")
            for i in range(len(syms) - 1):
                counts[f"{syms[i]} {syms[i + 1]}"] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        pair, cnt = best
        if cnt < 1:
            break
        merged = pair.replace(" ", "")
        merges.append((r, pair, merged, cnt))
        pat, rep = f" {pair} ", f" {merged} "
        for w in segs:
            s = f" {segs[w]} "
            for _ in range(passes):
                s = s.replace(pat, rep)
            segs[w] = s.strip()
    return merges


def test_heap_trainer_fuzz_equals_naive():
    import random

    from breg_dcat_harvester_spark.operators.bpe import _train_from_freqs

    rng = random.Random(99)
    for trial in range(60):
        n_words = rng.randrange(1, 12)
        freqs = {}
        for _ in range(n_words):
            w = "".join(rng.choice("abc") for _ in range(rng.randrange(1, 7)))
            freqs[w] = freqs.get(w, 0) + rng.randrange(1, 6)
        num_merges = rng.randrange(1, 12)
        passes = rng.choice([3, 12])
        got = _train_from_freqs(dict(freqs), num_merges, passes)
        want = _naive_train(dict(freqs), num_merges, passes)
        assert got == want, (trial, freqs, num_merges, passes, got, want)
