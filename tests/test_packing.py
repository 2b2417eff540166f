"""Sequence packing + shuffle-shard + span-dedup unit tests.

The load-bearing claim of operators/packing.py is that the DISTRIBUTED
prefix sum (range partition -> local window -> sliver base offsets) is
row-identical to the obvious single-window form at any partition count —
that's what lets the oracle use the simple form while production scales.
"""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.dedup import (
    boilerplate_chunks,
    remove_boilerplate,
)
from breg_dcat_harvester_spark.operators.packing import (
    pack_sequences,
    pack_sequences_single_window,
    shard_manifest,
    shuffle_shards,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic synthetic: 3 strata, token counts 1..40, incl. a doc
    # longer than seq_len (spans >= 2 packs) and an empty-ish 1-token doc
    rows = []
    for i in range(120):
        lang = ["en", "de", "fr"][i % 3]
        n = (i * 7) % 40 + 1
        rows.append((i, lang, " ".join(f"w{i}t{j}" for j in range(n))))
    rows.append((200, "en", " ".join("long" for _ in range(73))))
    rows.append((201, "fr", "solo"))
    return _docs(spark, rows)


@pytest.mark.parametrize("parts", [1, 3, 17])
def test_pack_distributed_equals_single_window(spark, corpus, parts):
    a = pack_sequences(corpus, seq_len=64, num_partitions=parts)
    b = pack_sequences_single_window(corpus, seq_len=64)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_invariants(spark, corpus):
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(corpus, seq_len=64, num_partitions=5).collect()
    }
    # the 73-token doc must span >= 2 packs of 64
    assert rows[200]["n_packs"] >= 2
    # offsets are in range; spans are consistent with offset+len
    for r in rows.values():
        assert 0 <= r["pack_offset"] < 64
        expected_spans = (r["pack_offset"] + r["n_tokens"] - 1) // 64 + 1
        assert r["n_packs"] == expected_spans
    # per-stratum total tokens == last doc's gstart + len (contiguity: no
    # gaps/overlaps in the concatenated stream)
    df = pack_sequences(corpus, seq_len=64, num_partitions=5)
    tot = (
        df.groupBy("stratum")
        .agg(
            F.sum("n_tokens").alias("sum_tok"),
            F.max(
                F.col("pack_id") * 64 + F.col("pack_offset") + F.col("n_tokens")
            ).alias("stream_end"),
        )
        .collect()
    )
    for r in tot:
        assert r["sum_tok"] == r["stream_end"], r


def test_pack_deterministic_across_input_partitioning(spark, corpus):
    a = pack_sequences(corpus.repartition(13), seq_len=64, num_partitions=4)
    b = pack_sequences(corpus.coalesce(1), seq_len=64, num_partitions=9)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_shuffle_shards_deterministic_and_balanced(spark, corpus):
    s1 = shuffle_shards(corpus, n_shards=8).collect()
    s2 = shuffle_shards(corpus.repartition(7), n_shards=8).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    m = {r["shard_id"]: r["n_docs"] for r in shard_manifest(shuffle_shards(corpus, n_shards=8)).collect()}
    assert sum(m.values()) == corpus.count()
    assert len(m) == 8  # 122 docs over 8 shards: every shard hit w.h.p.


def test_boilerplate_removal_exact(spark):
    # 6 docs share the chunk "a b c" (>= min_docs=5); one doc is ALL
    # boilerplate and must survive with clean_text=''
    rows = [(i, "en", "a b c x%d y%d z%d" % (i, i, i)) for i in range(5)]
    rows.append((5, "en", "a b c"))
    rows.append((6, "en", "p q r s t u"))
    df = _docs(spark, rows)
    hot = boilerplate_chunks(df, chunk_tokens=3, min_docs=5).collect()
    assert len(hot) == 1 and hot[0]["n_docs"] == 6
    out = {r["doc_id"]: r for r in remove_boilerplate(df, 3, 5).collect()}
    assert out[5]["clean_text"] == "" and out[5]["n_removed"] == 1
    assert out[0]["clean_text"] == "x0 y0 z0" and out[0]["n_removed"] == 1
    assert out[6]["clean_text"] == "p q r s t u" and out[6]["n_removed"] == 0


def test_boilerplate_repeated_chunk_within_one_doc_not_hot(spark):
    # the same chunk 10x inside ONE doc is 1 distinct doc — not boilerplate
    df = _docs(spark, [(0, "en", " ".join(["a b c"] * 10)), (1, "en", "d e f")])
    assert boilerplate_chunks(df, chunk_tokens=3, min_docs=2).count() == 0


def test_pack_manifest_tiles_every_pack(spark, corpus):
    from breg_dcat_harvester_spark.operators.packing import pack_manifest

    placed = pack_sequences(corpus, seq_len=64, num_partitions=5)
    man = pack_manifest(placed, seq_len=64)
    rows = man.collect()
    # segment arithmetic: every segment inside [0, 64) x [0, n_tokens)
    ntok = {r["doc_id"]: r["n_tokens"] for r in placed.collect()}
    for r in rows:
        assert 0 <= r["pack_start"] < 64
        assert r["n_toks"] >= 1
        assert r["pack_start"] + r["n_toks"] <= 64
        assert r["doc_start"] + r["n_toks"] <= ntok[r["doc_id"]]
    # per doc: segments tile [0, n_tokens) exactly
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append((r["doc_start"], r["n_toks"]))
    for d, segs in per_doc.items():
        segs.sort()
        assert segs[0][0] == 0
        for (s0, n0), (s1, _n1) in zip(segs, segs[1:]):
            assert s0 + n0 == s1, (d, segs)
        assert segs[-1][0] + segs[-1][1] == ntok[d]
    # per pack: full packs tile [0, 64) exactly; only each stratum's LAST
    # pack may be partial
    per_pack = {}
    for r in rows:
        per_pack.setdefault((r["stratum"], r["pack_id"]), []).append(
            (r["pack_start"], r["n_toks"])
        )
    last = {}
    for (st, p) in per_pack:
        last[st] = max(last.get(st, -1), p)
    for (st, p), segs in per_pack.items():
        segs.sort()
        assert segs[0][0] == 0
        for (s0, n0), (s1, _n1) in zip(segs, segs[1:]):
            assert s0 + n0 == s1, (st, p, segs)
        if p != last[st]:
            assert segs[-1][0] + segs[-1][1] == 64, (st, p, segs)


def test_pack_manifest_no_extra_shuffle(spark, corpus):
    """pack_manifest adds zero Exchanges on top of pack_sequences."""
    import io, re
    from contextlib import redirect_stdout
    from breg_dcat_harvester_spark.operators.packing import pack_manifest

    def nex(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        ops = re.findall(
            r"^\(\d+\) (\w[\w ]*?)\s*(?:\[codegen id : \d+\])?\s*$",
            buf.getvalue(),
            re.MULTILINE,
        )
        return sum(1 for o in ops if o == "Exchange")

    placed = pack_sequences(corpus, seq_len=64, num_partitions=5)
    assert nex(pack_manifest(placed, seq_len=64)) == nex(placed)


def test_sft_pack_masks_cover_exactly_completions(spark):
    import datetime as dt

    from breg_dcat_harvester_spark.operators.conversation import sft_pairs
    from breg_dcat_harvester_spark.operators.packing import (
        default_token_count,
        sft_pack_masks,
    )

    ts = dt.datetime(2024, 1, 1)
    rows = []
    # 12 conversations of user->assistant pairs with growing texts so pairs
    # span pack boundaries at seq_len=16
    for i in range(12):
        rows.append((f"c{i:02d}", 0, "user", "q " * (i + 3), None, ts))
        rows.append((f"c{i:02d}", 1, "assistant", "a " * (2 * i + 2), None, ts))
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    pairs = sft_pairs(t, context_turns=4)
    masks = sft_pack_masks(pairs, seq_len=16)
    got = masks.collect()
    assert len(got) > 0
    # masks never leave their pack
    assert all(0 <= r.mask_start and r.mask_start + r.mask_len <= 16 for r in got)
    # per pair: total masked tokens == completion token count (the loss
    # covers exactly the completion, nothing of the prompt)
    per = {}
    for r in got:
        per[r.doc_id] = per.get(r.doc_id, 0) + r.mask_len
    want = {
        f"{r.conv_id}#{r.turn_idx}": r.n
        for r in pairs.select(
            "conv_id", "turn_idx",
            default_token_count(F.col("completion")).alias("n"),
        ).collect()
    }
    assert per == want
    # at least one pair's mask is split across two packs (the boundary case)
    from collections import Counter

    assert Counter(r.doc_id for r in got).most_common(1)[0][1] >= 2
