"""Corpus-adaptive bigram quality scoring (operators/lmquality.py)."""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators import lmquality as lmq


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 20 near-identical natural docs dominate the bigram distribution
        *[(i, "the quick brown fox jumps over the lazy dog again and again")
          for i in range(20)],
        (100, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),
        (101, "qZ0xKv9QJw3pXy1Lm8Rt2Bn"),  # base64-ish: rare bigrams
        (102, "a"),  # one char: zero bigrams
        (103, ""),  # empty: zero bigrams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_bounded_and_thresholded(corpus):
    model = lmq.train_char_bigram_model(corpus, min_count=3)
    rows = model.collect()
    assert all(r.cnt >= 3 for r in rows)
    # bounded by charset^2 — here a few dozen grams from the repeated doc
    assert 0 < len(rows) < 200


def test_scores_separate_natural_from_garbage(corpus):
    rep = lmq.lm_quality_report(corpus, min_count=3, keep_per_mille=700)
    by_id = {r.doc_id: r for r in rep.collect()}
    assert by_id[0].common_per_mille == 1000 and by_id[0].keep
    # case folding: uppercase twin shares most grams with the model
    assert by_id[100].common_per_mille >= 700 and by_id[100].keep
    assert by_id[101].common_per_mille < 300 and not by_id[101].keep
    # degenerate docs survive with zero grams, flagged not-keep
    assert by_id[102].n_grams == 0 and not by_id[102].keep
    assert by_id[103].n_grams == 0 and not by_id[103].keep
    assert len(by_id) == corpus.count()


def test_bigram_counts(corpus):
    n = (
        corpus.filter(F.col("doc_id") == 0)
        .select(F.size(lmq._bigrams("text")).alias("n"))
        .collect()[0]
        .n
    )
    text = "the quick brown fox jumps over the lazy dog again and again"
    assert n == len(text) - 1


def test_separable_model_reuse(corpus, spark):
    # persisted-model flow: train once, score a different shard
    model = lmq.train_char_bigram_model(corpus, min_count=3)
    shard = spark.createDataFrame(
        [(200, "the quick brown fox"), (201, "zqxj wvkp zzzz")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in lmq.lm_quality_score(shard, model).collect()}
    assert got[200].common_per_mille > got[201].common_per_mille


def test_materialized_equals_audit_form(corpus):
    """Deployment (persist-then-score) form reproduces the single-plan
    audit twin value-for-value, including degenerate docs."""
    want = {
        tuple(r)
        for r in lmq.lm_quality_report(
            corpus, min_count=3, keep_per_mille=700
        ).collect()
    }
    got = {
        tuple(r)
        for r in lmq.lm_quality_report_materialized(
            corpus, min_count=3, keep_per_mille=700
        ).collect()
    }
    assert got == want


def test_materialized_model_cap_guards_collect(corpus):
    with pytest.raises(ValueError, match="max_model_rows"):
        lmq.lm_quality_report_materialized(
            corpus, min_count=1, max_model_rows=3
        ).collect()


def test_materialized_accepts_precollected_model(corpus):
    """Deployment path: train once, pass the collected set back — no
    training job runs on subsequent scoring calls."""
    model = frozenset(
        r.gram for r in lmq.train_char_bigram_model(corpus, min_count=3).collect()
    )
    via_set = {
        tuple(r)
        for r in lmq.lm_quality_report_materialized(
            corpus, keep_per_mille=700, model_grams=model
        ).collect()
    }
    via_train = {
        tuple(r)
        for r in lmq.lm_quality_report_materialized(
            corpus, min_count=3, keep_per_mille=700
        ).collect()
    }
    assert via_set == via_train


def test_materialized_plan_is_map_only(corpus):
    plan = (
        lmq.lm_quality_report_materialized(corpus, min_count=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_score_plan_is_broadcast_and_partial(corpus):
    model = lmq.train_char_bigram_model(corpus, min_count=3)
    plan = (
        lmq.lm_quality_score(corpus, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan  # map-side partial agg before the doc rollup
