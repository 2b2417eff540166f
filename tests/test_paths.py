"""Property-path reachability (operators/paths.py::reachable_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.paths import reachable_pairs

P = "urn:p"


def _edges(spark, pairs, pred=P):
    return spark.createDataFrame(
        [(a, pred, b, "uri") for a, b in pairs],
        "subj string, pred string, obj string, obj_kind string",
    )


def _closure(df):
    return {(r.src, r.dst): r.depth for r in df.collect()}


def test_chain_min_depths(spark):
    # a -> b -> c -> d: six pairs, depth = hop distance
    got = _closure(reachable_pairs(_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])))
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 2, ("b", "d"): 2,
        ("a", "d"): 3,
    }


def test_diamond_takes_shortest_path(spark):
    # a->b->d and a->d directly: depth(a,d) must be 1, not 2
    got = _closure(reachable_pairs(_edges(spark, [("a", "b"), ("b", "d"), ("a", "d")])))
    assert got[("a", "d")] == 1


def test_cycle_terminates_and_excludes_self(spark):
    # 3-cycle: every ordered pair of distinct nodes reachable; no (x, x) rows
    got = _closure(reachable_pairs(_edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])))
    nodes = {"a", "b", "c"}
    assert set(got) == {(x, y) for x in nodes for y in nodes if x != y}
    assert max(got.values()) == 2


def test_pred_whitelist_and_literal_objects_excluded(spark):
    e = spark.createDataFrame(
        [
            ("a", P, "b", "uri"),
            ("b", "urn:other", "c", "uri"),   # predicate not whitelisted
            ("b", P, "lit", "literal"),        # literal object: not a node
        ],
        "subj string, pred string, obj string, obj_kind string",
    )
    got = _closure(reachable_pairs(e, preds=[P]))
    assert got == {("a", "b"): 1}


def test_max_hops_bounds_depth(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    got = _closure(reachable_pairs(_edges(spark, chain), max_hops=2))
    assert max(got.values()) == 2
    assert ("n0", "n3") not in got


def test_parallelism_invariant(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(20)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, reachable_pairs(e).collect()))
    b = sorted(map(tuple, reachable_pairs(e.repartition(13)).collect()))
    assert a == b
