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
        CLEAR DEFAULT
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


# --- fuzz: random ground-update sequences vs a pure-Python set model ------


def _model_apply(graph: set, ops):
    """Reference semantics: graph is a set of 6-term tuples."""
    g = set(graph)
    for kind, rows in ops:
        if kind == "clear":
            g = set()
        elif kind == "insert":
            g |= set(rows)
        else:  # delete
            g -= set(rows)
    return g


def _term(rng):
    kind = rng.choice(["uri", "lit", "lang", "typed"])
    v = f"v{rng.randrange(4)}"
    if kind == "uri":
        return (f"urn:o{rng.randrange(4)}", "uri", None, None)
    if kind == "lang":
        return (v, "literal", rng.choice(["en", "de"]), None)
    if kind == "typed":
        return (v, "literal", None, "http://www.w3.org/2001/XMLSchema#integer")
    return (v, "literal", None, None)


def _rand_rows(rng, k):
    out = []
    for _ in range(k):
        obj, ok, lang, dt = _term(rng)
        out.append(
            (f"urn:s{rng.randrange(3)}", f"urn:p{rng.randrange(3)}", obj, ok, lang, dt)
        )
    return out


def _to_sparql(rows):
    def t(o, ok, lang, dt):
        if ok == "uri":
            return f"<{o}>"
        if lang:
            return f'"{o}"@{lang}'
        if dt:
            return f'"{o}"^^<{dt}>'
        return f'"{o}"'

    return " . ".join(
        f"<{s}> <{p}> {t(o, ok, lang, dt)}" for (s, p, o, ok, lang, dt) in rows
    )


def test_fuzz_ground_update_sequences_vs_set_model(spark):
    import random

    rng = random.Random(1234)
    for trial in range(6):
        base = _rand_rows(rng, rng.randrange(0, 8))
        graph = spark.createDataFrame(
            sorted(set(base)) or [], TRIPLE_STRUCT
        )
        ops, texts = [], []
        for _ in range(rng.randrange(1, 4)):
            kind = rng.choice(["insert", "insert", "delete", "clear"])
            if kind == "clear":
                ops.append(("clear", []))
                texts.append("CLEAR DEFAULT")
            else:
                rows = _rand_rows(rng, rng.randrange(1, 4))
                ops.append((kind, rows))
                kw = "INSERT DATA" if kind == "insert" else "DELETE DATA"
                texts.append(f"{kw} {{ {_to_sparql(rows)} }}")
        got = {tuple(r) for r in su.apply_update(graph, " ; ".join(texts)).collect()}
        want = _model_apply(set(base), ops)
        assert got == want, (
            f"trial {trial}: {' ; '.join(texts)}\n got={sorted(got)}\n want={sorted(want)}"
        )


def test_clear_graph_named_is_refused_clear_named_noop(spark):
    # CLEAR GRAPH <iri> would wipe the single unnamed graph no matter which
    # IRI was named — the subset contract refuses it instead
    with pytest.raises(su.SparqlUnsupported, match="CLEAR GRAPH"):
        su.parse_update("CLEAR GRAPH <urn:other>")
    # CLEAR NAMED clears the (empty) set of named graphs: a true no-op
    g = spark.createDataFrame(
        [("urn:s", "urn:p", "urn:o", "uri", None, None)],
        "subj string, pred string, obj string, obj_kind string, "
        "lang string, dtype string",
    )
    out = su.apply_update(g, "CLEAR NAMED")
    assert out.count() == 1
    assert su.apply_update(g, "CLEAR DEFAULT").count() == 0
