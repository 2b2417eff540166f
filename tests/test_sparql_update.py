"""SPARQL 1.1 Update subset (plans/sparql_update.py) — the reference's
write path (store.py:19-54 posts SPARQL Update via rdflib's
SPARQLUpdateStore) as set-algebra plans over a triple-set snapshot."""

import pytest

from breg_dcat_harvester_spark.plans import sparql_update as su
from breg_dcat_harvester_spark.plans.sparql import SparqlError, SparqlUnsupported
from breg_dcat_harvester_spark.schema import TRIPLE_STRUCT

ROWS = [
    ("urn:a", "urn:p", "urn:b", "uri", None, None),
    ("urn:a", "urn:label", "hello", "literal", "en", None),
    ("urn:b", "urn:label", "welt", "literal", "de", None),
    ("urn:c", "urn:p", "urn:a", "uri", None, None),
]


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(ROWS, TRIPLE_STRUCT).cache()


def _terms(df):
    return {tuple(r) for r in df.collect()}


# --- parsing ------------------------------------------------------------

def test_parse_sequence_and_prefix():
    ops = su.parse_update(
        """
        PREFIX ex: <urn:ex:>
        INSERT DATA { ex:s ex:p ex:o } ;
        DELETE DATA { ex:s ex:p "lit"@en } ;
        CLEAR GRAPH <urn:g>
        """
    )
    assert [o.kind for o in ops] == ["insert_data", "delete_data", "clear"]
    assert ops[0].data == [
        {"subj": "urn:ex:s", "pred": "urn:ex:p", "obj": "urn:ex:o",
         "obj_kind": "uri", "lang": None, "dtype": None}
    ]
    assert ops[1].data[0]["lang"] == "en"


def test_parse_refusals():
    with pytest.raises(SparqlError):
        su.parse_update('INSERT DATA { ?s <urn:p> <urn:o> }')
    with pytest.raises(SparqlUnsupported):
        su.parse_update('DELETE WHERE { ?s <urn:p>+ ?o }')
    with pytest.raises(SparqlUnsupported):
        su.parse_update('DROP GRAPH <urn:g>')
    with pytest.raises(SparqlError):
        su.parse_update('INSERT DATA { "lit" <urn:p> <urn:o> }')


# --- semantics ----------------------------------------------------------

def test_insert_data_set_semantics(graph):
    out = su.apply_update(
        graph,
        'INSERT DATA { <urn:a> <urn:p> <urn:b> . <urn:x> <urn:p> "v"@fr }',
    )
    got = _terms(out)
    assert len(got) == 5  # existing row NOT duplicated
    assert ("urn:x", "urn:p", "v", "literal", "fr", None) in got


def test_delete_data_null_safe_lang(graph):
    # exact lang match deletes; wrong lang is a different term — no-op
    assert su.apply_update(
        graph, 'DELETE DATA { <urn:a> <urn:label> "hello"@en }'
    ).count() == 3
    assert su.apply_update(
        graph, 'DELETE DATA { <urn:a> <urn:label> "hello"@de }'
    ).count() == 4


def test_modify_pre_state_semantics(graph):
    # predicate rename: both templates instantiate against the PRE-update
    # graph — the insert sees the rows the delete removes
    out = su.apply_update(
        graph,
        'DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:q> ?o } '
        'WHERE { ?s <urn:p> ?o }',
    )
    got = {(s, p, o) for (s, p, o, *_rest) in _terms(out)}
    assert ("urn:a", "urn:q", "urn:b") in got
    assert ("urn:c", "urn:q", "urn:a") in got
    assert not any(p == "urn:p" for _, p, _ in got)


def test_modify_carries_object_metadata(graph):
    # literal object keeps lang through the template instantiation
    out = su.apply_update(
        graph,
        'DELETE { ?s <urn:label> ?l } INSERT { ?s <urn:name> ?l } '
        'WHERE { ?s <urn:label> ?l }',
    )
    got = _terms(out)
    assert ("urn:a", "urn:name", "hello", "literal", "en", None) in got
    assert ("urn:b", "urn:name", "welt", "literal", "de", None) in got


def test_delete_where(graph):
    out = su.apply_update(graph, 'DELETE WHERE { ?s <urn:label> ?o }')
    assert out.count() == 2
    assert all(r.pred == "urn:p" for r in out.collect())


def test_clear_then_sequence(graph):
    out = su.apply_update(
        graph,
        'CLEAR DEFAULT ; INSERT DATA { <urn:z> <urn:p> <urn:y> }',
    )
    assert _terms(out) == {("urn:z", "urn:p", "urn:y", "uri", None, None)}


def test_sequential_ops_see_prior_state(graph):
    # second op's WHERE matches a triple the first op inserted
    out = su.apply_update(
        graph,
        'INSERT DATA { <urn:n> <urn:p> <urn:a> } ; '
        'DELETE { ?s <urn:p> ?o } INSERT { ?o <urn:rev> ?s } '
        'WHERE { ?s <urn:p> ?o }',
    )
    got = {(s, p, o) for (s, p, o, *_r) in _terms(out)}
    assert ("urn:a", "urn:rev", "urn:n") in got  # from the inserted row
    assert not any(p == "urn:p" for _, p, _ in got)


def test_insert_plan_never_shuffles_graph(graph):
    # the INSERT set-dedup must not re-shuffle/distinct the whole graph:
    # the union's graph branch is exchange-free (scan + union only)
    out = su.apply_update(
        graph, 'INSERT DATA { <urn:x> <urn:p> <urn:y> }'
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one Union at the top; the graph side feeds it without aggregation
    assert "Union" in plan
    assert "HashAggregate" not in plan.split("Union")[0]
