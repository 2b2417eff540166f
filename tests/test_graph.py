"""Graph QA probes (operators/graph.py): integer PageRank + triangles."""

from __future__ import annotations

from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.graph import (
    node_triangles,
    pagerank_integer,
)

P = "urn:p"


def _edges(spark, pairs, kind="uri"):
    return spark.createDataFrame(
        [(a, P, b, kind) for a, b in pairs],
        "subj string, pred string, obj string, obj_kind string",
    )


def _pagerank_replay(pairs, iterations, damping_permille=850, scale=1_000_000):
    """Pure-Python integer replay of the exact contract."""
    links = sorted({(a, b) for a, b in pairs if a != b})
    nodes = sorted({x for e in links for x in e})
    outdeg: dict[str, int] = {}
    for a, _ in links:
        outdeg[a] = outdeg.get(a, 0) + 1
    base = scale * (1000 - damping_permille) // 1000
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for a, b in links:
            contrib[b] += (rank[a] * damping_permille) // (1000 * outdeg[a])
        rank = {n: base + contrib[n] for n in nodes}
    return rank


def test_pagerank_matches_integer_replay(spark):
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "d"),  # self-loop dropped
    ]
    got = {r.node: r.rank for r in pagerank_integer(_edges(spark, pairs)).collect()}
    assert got == _pagerank_replay(pairs, iterations=5)


def test_pagerank_sink_keeps_base_only(spark):
    # b is a sink: it receives, never emits; a dangling node's mass vanishes
    got = {
        r.node: r.rank
        for r in pagerank_integer(_edges(spark, [("a", "b")]), iterations=1).collect()
    }
    assert got == {"a": 150_000, "b": 150_000 + (1_000_000 * 850) // 1000}


def test_pagerank_deterministic_across_partitioning(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(200)]
    df = _edges(spark, pairs)
    one = {r.node: r.rank for r in pagerank_integer(df.coalesce(1)).collect()}
    many = {r.node: r.rank for r in pagerank_integer(df.repartition(16)).collect()}
    assert one == many


def test_triangles_single_and_clique(spark):
    # one triangle + a pendant edge
    got = {
        r.node: r.triangles
        for r in node_triangles(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
        ).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1}

    # K4: four triangles, each node in three; direction/duplicates irrelevant
    k4 = [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
          ("d", "b"), ("c", "d")]
    got = {r.node: r.triangles for r in node_triangles(_edges(spark, k4)).collect()}
    assert got == {n: 3 for n in "abcd"}


def test_triangles_ignore_literals_and_wedges(spark):
    df = _edges(spark, [("a", "b"), ("b", "c")]).unionByName(
        _edges(spark, [("c", "a")], kind="literal")
    )
    assert node_triangles(df).count() == 0  # open wedge: literal edge no-op
