"""Incremental MinHash dedup (dedup.incremental_minhash_pairs).

The increment-vs-index path must find exactly the pairs the full LSH run
finds, restricted to pairs touching the increment — and the precomputed
base_index path must be identical to the recompute path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_band_keys,
    minhash_lsh_pairs,
    shingle_arrays,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic corpus with planted near-dups that straddle the split:
    # doc 10*k is a light edit of doc 10*k+1 (new x base), doc 50/60 near-dup
    # each other (new x new).  Filler docs use a PER-DOC vocabulary
    # (w<i>x<j>) so they share zero shingles — the only pairs in the corpus
    # are the planted ones.
    rows = []
    for i in range(80):
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(30))))
    # plant: 20 ~ 21, 40 ~ 41 (new x base), 50 ~ 60 (new x new)
    for a, b in [(20, 21), (40, 41), (50, 60)]:
        text = rows[a][1].split()
        text[-1] = "edited"
        rows[b] = (b, " ".join(text))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _pairs(df):
    return {(r.a, r.b, r.g_inter, r.g_union) for r in df.collect()}


def test_incremental_equals_full_restricted(corpus):
    new = corpus.filter(F.col("doc_id") % 10 == 0)
    base = corpus.filter(F.col("doc_id") % 10 != 0)
    inc = _pairs(incremental_minhash_pairs(new, base, threshold=0.8))
    full = _pairs(
        minhash_lsh_pairs(corpus, threshold=0.8).filter(
            (F.col("a") % 10 == 0) | (F.col("b") % 10 == 0)
        )
    )
    assert inc == full
    # exactly the planted pairs, nothing else (filler shares no shingles)
    assert {(a, b) for (a, b, _, _) in inc} == {(20, 21), (40, 41), (50, 60)}


def test_precomputed_index_path_identical(corpus):
    new = corpus.filter(F.col("doc_id") % 10 == 0)
    base = corpus.filter(F.col("doc_id") % 10 != 0)
    idx = minhash_band_keys(shingle_arrays(base.select("doc_id", "text")))
    via_index = _pairs(
        incremental_minhash_pairs(new, base, threshold=0.8, base_index=idx)
    )
    recompute = _pairs(incremental_minhash_pairs(new, base, threshold=0.8))
    assert via_index == recompute


def test_flooded_bucket_guard_is_symmetric(spark):
    # 300 identical NEW docs + 1 identical base doc: combined bucket size
    # 301 > max_bucket, so EVERY pair for that text is dropped — including
    # new x base, where the base-side bucket alone (size 1) would pass an
    # asymmetric guard and fan each of the 300 new docs into a pair
    hot_text = "hot boiler plate text repeated across the arriving shard"
    new = spark.createDataFrame(
        [(i, hot_text) for i in range(300)], "doc_id long, text string"
    )
    base = spark.createDataFrame(
        [(1000, hot_text), (1001, "entirely unrelated quiet base document")],
        "doc_id long, text string",
    )
    out = incremental_minhash_pairs(new, base, threshold=0.8, max_bucket=256)
    assert out.count() == 0


def test_precomputed_bucket_counts_identical(corpus):
    from pyspark.sql import functions as SF

    new = corpus.filter(F.col("doc_id") % 10 == 0)
    base = corpus.filter(F.col("doc_id") % 10 != 0)
    idx = minhash_band_keys(shingle_arrays(base.select("doc_id", "text")))
    counts = idx.groupBy("band_id", "band_hash").agg(SF.count(SF.lit(1)).alias("_n"))
    via_counts = _pairs(
        incremental_minhash_pairs(
            new, base, threshold=0.8, base_index=idx, base_bucket_counts=counts
        )
    )
    assert via_counts == _pairs(incremental_minhash_pairs(new, base, threshold=0.8))


def test_base_never_pairs_with_base(corpus):
    new = corpus.filter(F.col("doc_id") % 10 == 0)
    base = corpus.filter(F.col("doc_id") % 10 != 0)
    out = incremental_minhash_pairs(new, base, threshold=0.8)
    bad = out.filter((F.col("a") % 10 != 0) & (F.col("b") % 10 != 0)).count()
    assert bad == 0
