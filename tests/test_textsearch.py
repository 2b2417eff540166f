"""BM25-shaped keyword search (operators/textsearch.py) — scaled-integer
ranking, deterministic at any parallelism, broadcast query-term filter."""

import pytest

from breg_dcat_harvester_spark.operators.textsearch import bm25_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark shuffle join join join"),
        (2, "spark table scan scan"),
        (3, "the quick brown fox"),
        (4, "join join spark " + "filler " * 50),
        (5, "shuffle"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_ranking_sanity(docs):
    out = bm25_topk(docs, [("q1", "spark join")], k=10).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # doc 3 and 5 match nothing from the query
    assert set(ranked) == {1, 2, 4}
    # doc 1: both terms, high tf, short doc -> best
    assert ranked[0] == 1
    # long doc 4 is length-penalized below doc 1 despite tf(join)=2
    assert ranked.index(4) > ranked.index(1)


def test_multi_query_and_k(docs):
    out = bm25_topk(
        docs, [("a", "spark"), ("b", "shuffle")], k=1
    ).collect()
    by_q = {r.query_id: r for r in out}
    assert set(by_q) == {"a", "b"}
    assert all(r.rank == 1 for r in out)


def test_deterministic_any_parallelism(docs):
    a = sorted(map(tuple, bm25_topk(docs.repartition(1), [("q", "spark join scan")]).collect()))
    b = sorted(map(tuple, bm25_topk(docs.repartition(7), [("q", "spark join scan")]).collect()))
    assert a == b


def test_no_match_query_empty(docs):
    assert bm25_topk(docs, [("q", "zzznope")], k=5).count() == 0


def test_query_terms_broadcast(docs):
    plan = (
        bm25_topk(docs, [("q", "spark")], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_query_tokenization_matches_document_split(spark):
    # a punctuated query term must match its split parts in documents
    docs = spark.createDataFrame(
        [(1, "the hash join strategy"), (2, "nested loop only")],
        "doc_id long, text string",
    )
    from breg_dcat_harvester_spark.operators.textsearch import bm25_topk

    out = bm25_topk(docs, [("q", "hash-join")], k=5).collect()
    assert {r.doc_id for r in out} == {1}
