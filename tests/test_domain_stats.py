"""Per-domain curation rollup (curation.domain_stats)."""

from __future__ import annotations

from breg_dcat_harvester_spark.operators.curation import domain_stats


def _docs(spark):
    rows = []
    # good.example: 30 docs, all pass the gate
    for i in range(30):
        rows.append((i, "good.example", "the quick brown fox jumps over the lazy dog " * 3))
    # spam.example: 30 docs, all digits (fail alpha ratio)
    for i in range(30, 60):
        rows.append((i, "spam.example", "111 222 333 444 555 666 777 888 999 000 " * 2))
    # tiny.example: 5 docs (below min_docs)
    for i in range(60, 65):
        rows.append((i, "tiny.example", "perfectly fine text with plenty of letters " * 3))
    # blocked.example: 30 good docs but blocklisted
    for i in range(65, 95):
        rows.append((i, "blocked.example", "clean and wholesome words all the way down " * 3))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_domain_verdicts(spark):
    out = {
        r.domain: r
        for r in domain_stats(
            _docs(spark),
            min_docs=10,
            min_quality_per_mille=500,
            blocklist=["blocked.example"],
            min_tokens=5,
            min_alpha_per_mille=300,
        ).collect()
    }
    assert out["good.example"].keep
    assert not out["spam.example"].keep          # quality rate 0
    assert not out["tiny.example"].keep          # below min_docs
    assert not out["blocked.example"].keep       # blocklist
    g = out["good.example"]
    assert g.n_docs == 30 and g.n_quality == 30 and g.quality_per_mille == 1000
    assert out["spam.example"].n_quality == 0
    # token totals are exact sums
    assert g.n_tokens_total == 30 * 27


def test_single_exchange_plan(spark):
    plan = (
        domain_stats(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # one hash-agg shuffle on the domain key
