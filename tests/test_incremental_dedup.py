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
    # each other (new x new), unrelated filler elsewhere
    base_words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(80):
        words = [base_words[(i * 7 + j) % len(base_words)] for j in range(30)]
        rows.append((i, " ".join(words)))
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
    assert len(inc) >= 3  # all three planted pairs touch the increment
    planted = {(a, b) for (a, b, _, _) in inc}
    assert {(20, 21), (40, 41), (50, 60)} <= planted


def test_precomputed_index_path_identical(corpus):
    new = corpus.filter(F.col("doc_id") % 10 == 0)
    base = corpus.filter(F.col("doc_id") % 10 != 0)
    idx = minhash_band_keys(shingle_arrays(base.select("doc_id", "text")))
    via_index = _pairs(
        incremental_minhash_pairs(new, base, threshold=0.8, base_index=idx)
    )
    recompute = _pairs(incremental_minhash_pairs(new, base, threshold=0.8))
    assert via_index == recompute


def test_base_never_pairs_with_base(corpus):
    new = corpus.filter(F.col("doc_id") % 10 == 0)
    base = corpus.filter(F.col("doc_id") % 10 != 0)
    out = incremental_minhash_pairs(new, base, threshold=0.8)
    bad = out.filter((F.col("a") % 10 != 0) & (F.col("b") % 10 != 0)).count()
    assert bad == 0
