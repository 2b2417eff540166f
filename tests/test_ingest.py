"""Shard admission plan (plans/ingest.py::ingest_increment)."""

from __future__ import annotations

from breg_dcat_harvester_spark.plans.ingest import ingest_increment

GOOD = "plenty of honest lowercase words stretched out to pass every quality gate " * 2


def _frames(spark):
    base = spark.createDataFrame(
        [
            (1, GOOD + "base one"),
            (3, GOOD + "base three"),
            (5, GOOD + "exact copy target"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, GOOD + "fresh and unique ten"),            # admitted
            (12, GOOD + "exact copy target"),               # exact dup of base 5
            (14, GOOD + "base one extra"),                  # near-dup of base 1
            (16, GOOD + "pair partner sixteen ok"),         # admitted (min id of 16/18)
            (18, GOOD + "pair partner sixteen okay"),       # near-dup of new 16
            (20, "1 2 3 4 5 6 7 8 9 0 " * 5),               # fails quality (alpha)
        ],
        "doc_id long, text string",
    )
    return new, base


def test_admission_decisions(spark):
    new, base = _frames(spark)
    rows = {r.doc_id: r for r in ingest_increment(new, base, threshold=0.8).collect()}
    assert set(rows) == {10, 12, 14, 16, 18, 20}  # every arriving doc gets a row
    assert rows[10].selected and not rows[10].exact_dup and not rows[10].near_dup
    assert rows[12].exact_dup and not rows[12].selected
    assert rows[14].near_dup and not rows[14].selected      # dup of the BASE
    assert rows[16].selected                                # min-id of the new pair
    assert rows[18].near_dup and not rows[18].selected      # doomed by smaller id
    assert not rows[20].quality_ok and not rows[20].selected
    # pii counts present and zero on clean text
    assert rows[10].n_pii == 0


def test_admission_is_deterministic_at_any_parallelism(spark):
    new, base = _frames(spark)
    a = sorted(map(tuple, ingest_increment(new, base).collect()))
    b = sorted(
        map(tuple, ingest_increment(new.repartition(7), base.repartition(5)).collect())
    )
    assert a == b
