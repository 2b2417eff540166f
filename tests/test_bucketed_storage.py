"""Bucketed triple layout: co-located subj joins plan ZERO exchanges.

The facet/star/SPARQL queries all self-join triples on subj; at cluster
scale the dominant cost is the per-query shuffle of the fact table.
write_bucketed_triples pays that shuffle once at write time; these tests
assert the payoff at the PLAN level (the quantity that matters at 100 TB):
a subj-keyed self-join over the bucketed table has no Exchange, while the
identical join over plain parquet shuffles both sides.
"""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.storage import count_exchanges, write_bucketed_triples


@pytest.fixture(scope="module")
def triples(spark):
    return spark.range(2000).select(
        F.concat(F.lit("s"), (F.col("id") % 500).cast("string")).alias("subj"),
        F.concat(F.lit("p"), (F.col("id") % 7).cast("string")).alias("pred"),
        F.concat(F.lit("o"), F.col("id").cast("string")).alias("obj"),
    )


@pytest.fixture()
def no_broadcast(spark):
    # disable BHJ + AQE so the plan shows the structural join strategy the
    # big-data path takes (at 100 TB neither side broadcasts)
    old_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_a = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_b)
    spark.conf.set("spark.sql.adaptive.enabled", old_a)


def _facet_self_join(t):
    # the J1-J4 shape: dataset ?s with pred p0 joined to its p1 value
    a = t.filter(F.col("pred") == "p0").select("subj", F.col("obj").alias("a"))
    b = t.filter(F.col("pred") == "p1").select("subj", F.col("obj").alias("b"))
    return a.join(b, "subj")


def test_bucketed_self_join_zero_exchanges(spark, triples, tmp_path, no_broadcast):
    write_bucketed_triples(
        triples, "triples_bucketed", buckets=8, path=str(tmp_path / "tb")
    )
    try:
        t = spark.table("triples_bucketed")
        joined = _facet_self_join(t)
        assert count_exchanges(joined) == 0, (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        # same data, same rows — layout is invisible to results
        plain_path = str(tmp_path / "plain")
        triples.write.parquet(plain_path)
        plain = _facet_self_join(spark.read.parquet(plain_path))
        assert count_exchanges(plain) == 2
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS triples_bucketed")


def test_bucketed_groupby_subj_zero_exchanges(spark, triples, tmp_path, no_broadcast):
    # per-subject aggregation (graph stats / detail assembly) also rides the
    # bucket layout: grouping on the bucket key needs no shuffle
    write_bucketed_triples(
        triples, "triples_bucketed_agg", buckets=8, path=str(tmp_path / "tba")
    )
    try:
        t = spark.table("triples_bucketed_agg")
        agg = t.groupBy("subj").agg(F.count("*").alias("n"))
        assert count_exchanges(agg) == 0
        assert agg.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS triples_bucketed_agg")
