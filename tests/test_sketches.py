"""Sketch operators: HLL audit, GK quantile audit, count-min relation,
Bloom-bits prefilter (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def skewed(spark):
    # key k_hot holds 25% of rows; 500 cold keys; val cycles 0..996
    df = spark.range(20000).select(
        F.when(F.col("id") % 4 == 0, F.lit("k_hot"))
        .otherwise(
            F.concat(F.lit("k"), (F.col("id") % 500).cast("string"))
        )
        .alias("key"),
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") % 997).alias("val"),
    ).cache()
    df.count()
    yield df
    df.unpersist()


# --- HLL ---------------------------------------------------------------------


def test_hll_audit_within_bound_all_groups(skewed):
    rows = sk.hll_distinct_audit(skewed, "grp", "val").collect()
    assert len(rows) == 7
    assert all(r.within_bound for r in rows)
    assert all(r.exact_distinct == 997 for r in rows)


def test_hll_production_close_to_exact(skewed):
    got = {r.grp: r.approx_distinct for r in sk.hll_distinct(skewed, "grp", "val").collect()}
    assert all(abs(v - 997) <= 4 * 0.023 * 997 for v in got.values())


def test_hll_audit_trips_on_broken_estimate(skewed):
    # sanity that the bound is not vacuous: a 2x-off estimate must fail it
    audit = sk.hll_distinct_audit(skewed, "grp", "val")
    broken = audit.withColumn(
        "within_bound",
        (
            F.abs(F.col("exact_distinct") * 2 - F.col("exact_distinct"))
            <= F.lit(4 * 0.023) * F.col("exact_distinct")
        ),
    )
    assert not any(r.within_bound for r in broken.collect())


# --- quantile ------------------------------------------------------------------


def test_quantile_audit_bracket(skewed):
    rows = sk.quantile_sketch_audit(skewed, "grp", "val").collect()
    assert len(rows) == 7
    assert all(r.within_bound for r in rows)
    # exact interpolated median of 0..996 cycling is ~498 +- cycle offset
    assert all(480 <= r.exact_p <= 515 for r in rows)


def test_quantile_sketch_array_shape(skewed):
    rows = sk.quantile_sketch(skewed, "grp", "val", [0.1, 0.5, 0.9]).collect()
    for r in rows:
        assert len(r.qs) == 3
        assert r.qs[0] <= r.qs[1] <= r.qs[2]


# --- count-min -----------------------------------------------------------------


def test_cms_bounded_size(skewed):
    sketch = sk.cms_build(skewed, "key", depth=4, width=64)
    assert sketch.count() <= 4 * 64
    # every sketch row sums to N
    sums = sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert {r.s for r in sums} == {20000}


def test_cms_estimate_never_undercounts(skewed):
    sketch = sk.cms_build(skewed, "key", depth=4, width=256)
    exact = skewed.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    est = sk.cms_estimate(sketch, exact.select("key"), "key", depth=4, width=256)
    joined = exact.join(est, "key").collect()
    assert len(joined) == exact.count()
    assert all(r.est >= r.exact for r in joined)


def test_cms_merge_of_shards_equals_union(skewed):
    # mergeability: union of per-shard sketches re-aggregated == one-shot
    a = skewed.filter(F.col("val") % 2 == 0)
    b = skewed.filter(F.col("val") % 2 == 1)
    merged = (
        sk.cms_build(a, "key", depth=3, width=128)
        .unionByName(sk.cms_build(b, "key", depth=3, width=128))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.cms_build(skewed, "key", depth=3, width=128)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_heavy_hitter_audit(skewed):
    rows = sk.cms_heavy_hitter_audit(skewed, "key", top_k=10).collect()
    assert len(rows) == 10
    assert rows is not None and all(r.cms_ok for r in rows)
    assert max(r.exact_count for r in rows) == 5000  # k_hot


# --- bloom ---------------------------------------------------------------------


def test_bloom_no_false_negatives(skewed):
    keys = skewed.select("key").distinct().filter(F.col("key") != "k_hot")
    bits = sk.bloom_bits(keys, "key", m=1 << 14, k=3)
    pre = sk.bloom_prefilter(skewed, "key", bits, m=1 << 14, k=3)
    exact = skewed.join(keys, "key", "left_semi")
    # prefilter must be a superset of the exact semi-join
    assert exact.exceptAll(pre).count() == 0


def test_bloom_semi_join_exact_equivalence(skewed, spark):
    keys = spark.range(80).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    )
    got = sk.bloom_semi_join(skewed, keys, "key")
    want = skewed.join(keys, "key", "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_prefilter_no_fact_shuffle(skewed, spark):
    # the fact side must reach the bloom joins without an Exchange: every
    # join is a broadcast left-semi
    keys = spark.range(10).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    )
    bits = sk.bloom_bits(keys, "key")
    plan = sk.bloom_prefilter(skewed, "key", bits)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the only hash exchanges allowed are on the (tiny, pre-broadcast) bits
    # side — its distinct() partitions on `pos`; the fact side must never
    # shuffle
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "pos#" not in line:
            raise AssertionError(f"unexpected fact-side shuffle: {line}")


def test_bloom_bits_bounded(spark):
    keys = spark.range(100000).select(F.col("id").cast("string").alias("key"))
    m = 1 << 10
    bits = sk.bloom_bits(keys, "key", m=m, k=4)
    assert bits.count() <= m
