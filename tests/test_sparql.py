"""SPARQL compiler (plans/sparql.py) — parser units + equality against the
hand-built facet/search builders on the reference's VERBATIM query text
(browser.py:167-244 facets, 262-296 detail, 337-405 search templating)."""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.datagen import LANGUAGES, THEMES
from breg_dcat_harvester_spark.operators import facets as fac
from breg_dcat_harvester_spark.operators import search as srch
from breg_dcat_harvester_spark.operators.extract import extract_edges
from breg_dcat_harvester_spark.operators.merge import merge_triples
from breg_dcat_harvester_spark.plans import sparql as sp
from breg_dcat_harvester_spark.schema import CLASS_URIS, EDGES, RDF_TYPE

PREFIXES = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX dcat: <http://www.w3.org/ns/dcat#>
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    PREFIX dct: <http://purl.org/dc/terms/>
"""

# browser.py:169-176 verbatim
FACET_TAXONOMY = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX dcat: <http://www.w3.org/ns/dcat#>
    SELECT ?subject ?predicate ?object
    WHERE {
        ?subject rdf:type dcat:Catalog .
        ?subject dcat:themeTaxonomy ?object .
    } LIMIT 50
"""

# (class URI, facet pred pname, hand builder) for the 5 endpoints
FACETS = [
    ("Catalog", "dcat:themeTaxonomy", fac.catalog_taxonomies),
    ("Catalog", "dct:spatial", fac.catalog_locations),
    ("Catalog", "dct:LinguisticSystem", fac.catalog_languages),  # J3 quirk
    ("Dataset", "dcat:theme", fac.dataset_themes),
]


@pytest.fixture(scope="module")
def golden_edges(golden_df):
    return merge_triples(extract_edges(golden_df, emit_provenance=False)).cache()


@pytest.fixture(scope="module")
def merged(small_transcripts):
    return merge_triples(extract_edges(small_transcripts)).cache()


# --- parser ------------------------------------------------------------------

def test_parse_facet_template():
    q = sp.parse_sparql(FACET_TAXONOMY)
    assert q.select == ["subject", "predicate", "object"]
    assert not q.distinct and q.limit == 50
    assert q.patterns == [
        (sp.Var("subject"), sp.Uri(RDF_TYPE), sp.Uri("http://www.w3.org/ns/dcat#Catalog")),
        (sp.Var("subject"), sp.Uri("http://www.w3.org/ns/dcat#themeTaxonomy"), sp.Var("object")),
    ]


def test_parse_terms_literals_and_a():
    q = sp.parse_sparql(
        'PREFIX ex: <http://ex.org/> SELECT ?s WHERE { '
        '?s a ex:T . ?s ex:p "v\\"x"@en . ?s ex:q "3"^^<http://www.w3.org/2001/XMLSchema#int> . }'
    )
    assert q.patterns[0][1] == sp.Uri(RDF_TYPE)
    assert q.patterns[1][2] == sp.Lit('v"x', "en", None)
    assert q.patterns[2][2] == sp.Lit("3", None, "http://www.w3.org/2001/XMLSchema#int")


def test_parse_filter_conjunction_and_optional():
    q = sp.parse_sparql(
        PREFIXES
        + """SELECT ?d ?t WHERE {
            ?d a dcat:Dataset .
            OPTIONAL { ?d dct:title ?t } .
            FILTER (?d IN (<http://a>, <http://b>) && ?t IN ("x"))
        } ORDER BY DESC(?d) ?t LIMIT 7"""
    )
    assert q.optionals == [[(sp.Var("d"), sp.Uri("http://purl.org/dc/terms/title"), sp.Var("t"))]]
    assert q.filters == [
        ("d", [sp.Uri("http://a"), sp.Uri("http://b")]),
        ("t", [sp.Lit("x", None, None)]),
    ]
    assert q.order_by == [("d", False), ("t", True)] and q.limit == 7


@pytest.mark.parametrize(
    "text",
    [
        "SELECT (1 AS ?x) WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { BIND(1 AS ?x) ?s ?p ?o }",
        "SELECT ?s WHERE { SERVICE <http://svc> { ?s <http://p> ?o } }",
        'SELECT ?s WHERE { ?s <http://p> ?o . FILTER (STR(?o) < "x") }',
        "SELECT ?s WHERE { GRAPH <http://g> { ?s <http://p> ?o } }",
    ],
)
def test_unsupported_constructs_raise(text):
    with pytest.raises(sp.SparqlError):
        sp.parse_sparql(text)


def test_undeclared_prefix_raises():
    with pytest.raises(sp.SparqlError, match="undeclared prefix"):
        sp.parse_sparql("SELECT ?s WHERE { ?s dct:title ?o }")


# --- compiler vs hand-built builders ----------------------------------------

def test_verbatim_taxonomy_template_matches_builder(golden_edges):
    rows = sp.compile_sparql(golden_edges, FACET_TAXONOMY).collect()
    # reference endpoint semantics: set(item[2]) of the template rows
    got = {r.object for r in rows}
    want = {r.term for r in fac.catalog_taxonomies(golden_edges).collect()}
    assert got == want
    # never-bound ?predicate projects as NULL (SPARQL unbound semantics)
    assert all(r.predicate is None for r in rows)


@pytest.mark.parametrize("cls,pred,builder", FACETS, ids=[f[1] for f in FACETS])
def test_facet_templates_match_builders(merged, cls, pred, builder):
    text = PREFIXES + (
        "SELECT ?subject ?predicate ?object WHERE { "
        f"?subject rdf:type dcat:{cls} . ?subject {pred} ?object . }}"
    )
    got = {r.object for r in sp.compile_sparql(merged, text).collect()}
    want = {r.term for r in builder(merged, limit=0).collect()}
    assert got == want and got


def test_publisher_type_chain_matches_builder(merged):
    text = PREFIXES + (
        "SELECT ?catalog ?publisher ?publisherType WHERE { "
        "?catalog rdf:type dcat:Catalog . "
        "?catalog dct:publisher ?publisher . "
        "?publisher dct:type ?publisherType . }"
    )
    got = {r.publisherType for r in sp.compile_sparql(merged, text).collect()}
    want = {r.term for r in fac.catalog_publisher_types(merged, limit=0).collect()}
    assert got == want and got


def test_search_star_template_matches_builder(merged):
    filters = {
        "theme": [THEMES[0], THEMES[1]],
        "language": [LANGUAGES[0]],
        "bogusKey": ["dropped"],  # P7 whitelist
    }
    compiled = sp.compile_sparql(merged, sp.build_search_query(filters, limit=0))
    got = {r.dataset for r in compiled.select("dataset").distinct().collect()}
    want = {r.dataset for r in srch.search_datasets(merged, filters, limit=0).collect()}
    assert got == want and got


def test_reference_facet_queries_compile(merged):
    for key, text in sp.REFERENCE_FACET_QUERIES.items():
        df = sp.compile_sparql(merged, text)
        assert df.count() <= 50, key


def test_detail_template_with_optional_matches_builder(merged):
    """The 12-var detail query (browser.py:262-296) incl. OPTIONAL + FILTER IN:
    aggregate the compiled bindings the same way dataset_details_flat does and
    require row-for-row equality."""
    filters = {"theme": [THEMES[0]], "language": [LANGUAGES[0]]}
    found = srch.search_datasets(merged, filters, limit=0)
    uris = sorted(r.dataset for r in found.collect())
    assert uris
    text = sp.build_detail_query(uris)

    def agg_sorted(col):
        return F.array_join(F.array_sort(F.collect_set(col)), "|")

    got = (
        sp.compile_sparql(merged, text)
        .groupBy("dataset", "distribution")
        .agg(
            F.min("catalog").alias("catalog"),
            agg_sorted("description").alias("descriptions"),
            agg_sorted("identifier").alias("identifiers"),
            agg_sorted("title").alias("titles"),
            agg_sorted("datasetSpatial").alias("locations"),
            agg_sorted("theme").alias("themes"),
            agg_sorted("language").alias("languages"),
            F.min("distributionURL").alias("dist_url"),
            F.min("distributionType").alias("dist_type"),
            agg_sorted("distributionDescription").alias("dist_descriptions"),
        )
        .orderBy("dataset", "distribution")
        .collect()
    )
    want = srch.dataset_details_flat(merged, found).collect()
    assert got == want and got


# --- semantics on a hand-made graph ------------------------------------------

@pytest.fixture(scope="module")
def tiny_edges(spark):
    rows = [
        ("s1", RDF_TYPE, CLASS_URIS["Dataset"], "uri", None, None),
        ("s2", RDF_TYPE, CLASS_URIS["Dataset"], "uri", None, None),
        ("s1", "http://p/title", "hello", "literal", "en", None),
        ("s1", "http://p/title", "hello", "literal", None, None),
        ("s2", "http://p/size", "3", "literal", None, "http://www.w3.org/2001/XMLSchema#int"),
        # a URI object sharing a literal's lexical form: term equality must
        # not conflate them
        ("s2", "http://p/link", "hello", "uri", None, None),
    ]
    cols = [f.name for f in EDGES.fields]
    data = [r + (None,) * (len(cols) - len(r)) for r in rows]
    return spark.createDataFrame(data, schema=EDGES)


def test_literal_term_equality(tiny_edges):
    base = 'PREFIX p: <http://p/> SELECT ?s WHERE {{ ?s p:title {} . }}'
    plain = sp.compile_sparql(tiny_edges, base.format('"hello"')).collect()
    tagged = sp.compile_sparql(tiny_edges, base.format('"hello"@en')).collect()
    assert [r.s for r in plain] == ["s1"] and [r.s for r in tagged] == ["s1"]
    typed = sp.compile_sparql(
        tiny_edges,
        'PREFIX p: <http://p/> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
        'SELECT ?s WHERE { ?s p:size "3"^^xsd:int . }',
    ).collect()
    assert [r.s for r in typed] == ["s2"]


def test_uri_object_not_conflated_with_literal(tiny_edges):
    got = sp.compile_sparql(
        tiny_edges, 'PREFIX p: <http://p/> SELECT ?s WHERE { ?s p:link <hello> . }'
    ).collect()
    assert [r.s for r in got] == ["s2"]


def test_optional_unmatched_is_null(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX dcat: <http://www.w3.org/ns/dcat#> "
        "PREFIX p: <http://p/> "
        "SELECT ?s ?sz WHERE { ?s rdf:type dcat:Dataset . "
        "OPTIONAL { ?s p:size ?sz } } ORDER BY ?s",
    ).collect()
    assert [(r.s, r.sz) for r in rows] == [("s1", None), ("s2", "3")]


def test_deterministic_limit_orders_projected_vars(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX dcat: <http://www.w3.org/ns/dcat#> "
        "SELECT ?s WHERE { ?s rdf:type dcat:Dataset . } LIMIT 1",
    ).collect()
    assert [r.s for r in rows] == ["s1"]


# --- SPARQL 1.1 property paths (p+) ------------------------------------------

@pytest.fixture(scope="module")
def path_edges(spark):
    B = "http://b/"
    rows = [
        ("c1", "http://p/has", B + "d1", "uri", None, None),
        (B + "d1", "http://p/has", B + "x1", "uri", None, None),
        (B + "x1", "http://p/has", B + "leaf", "uri", None, None),
        ("c1", "http://p/other", B + "d9", "uri", None, None),   # wrong pred
        (B + "d1", "http://p/note", "lit", "literal", None, None),
    ]
    cols = [f.name for f in EDGES.fields]
    data = [r + (None,) * (len(cols) - len(r)) for r in rows]
    return spark.createDataFrame(data, schema=EDGES)


def test_path_plus_parses():
    q = sp.parse_sparql(
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a p:has+ ?b . }"
    )
    (s, p, o) = q.patterns[0]
    assert isinstance(p, sp.PathPlus) and p.pred.value == "http://p/has"


def test_path_plus_closure_semantics(path_edges):
    got = sorted(
        (r.a, r.b)
        for r in sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a p:has+ ?b . }",
        ).collect()
    )
    B = "http://b/"
    assert got == sorted([
        ("c1", B + "d1"), ("c1", B + "x1"), ("c1", B + "leaf"),
        (B + "d1", B + "x1"), (B + "d1", B + "leaf"),
        (B + "x1", B + "leaf"),
    ])


def test_path_plus_constant_endpoint_and_join(path_edges):
    # constant subject; the path pattern joins a plain pattern on ?b
    rows = sp.compile_sparql(
        path_edges,
        'PREFIX p: <http://p/> SELECT ?b ?n WHERE { <c1> p:has+ ?b . '
        "OPTIONAL { ?b p:note ?n } } ORDER BY ?b",
    ).collect()
    assert [(r.b, r.n) for r in rows] == [
        ("http://b/d1", "lit"), ("http://b/leaf", None), ("http://b/x1", None),
    ]


@pytest.mark.parametrize(
    "text",
    [
        "PREFIX p: <http://p/> SELECT ?a WHERE { ?a ?q+ ?b . }",
        "PREFIX p: <http://p/> SELECT ?a WHERE { ?a p:has+ ?a . }",
        'PREFIX p: <http://p/> SELECT ?a WHERE { ?a p:has+ "lit" . }',
    ],
)
def test_path_plus_unsupported_forms_raise(path_edges, text):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(path_edges, text)


# --- SPARQL 1.1 sequence paths (p1/p2) ---------------------------------------

def test_sequence_path_desugars_to_chain():
    q = sp.parse_sparql(
        "PREFIX p: <http://p/> SELECT ?a ?c WHERE { ?a p:x/p:y ?c . }"
    )
    assert len(q.patterns) == 2
    (s1, p1, o1), (s2, p2, o2) = q.patterns
    assert (s1.name, p1.value) == ("a", "http://p/x")
    assert (p2.value, o2.name) == ("http://p/y", "c")
    assert o1 == s2 and o1.name.startswith("__seq")


def test_sequence_path_join_semantics(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?c WHERE { ?a p:has/p:has ?c . }",
    ).collect()
    B = "http://b/"
    assert sorted((r.a, r.c) for r in rows) == sorted(
        [("c1", B + "x1"), (B + "d1", B + "leaf")]
    )


def test_sequence_path_with_plus_segment(path_edges):
    # has+/note: every node reachable from c1 that carries a note literal
    rows = sp.compile_sparql(
        path_edges,
        'PREFIX p: <http://p/> SELECT ?n WHERE { <c1> p:has+/p:note ?n . }',
    ).collect()
    assert [r.n for r in rows] == ["lit"]


def test_sequence_path_intermediates_not_projected(path_edges):
    df = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a WHERE { ?a p:has/p:has ?c . }",
    )
    assert df.columns == ["a"]


# --- SPARQL 1.1 inverse (^p), alternation (p1|p2) and UNION ------------------

def test_inverse_path_desugars_to_swapped_pattern():
    q = sp.parse_sparql(
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a ^p:has ?b . }"
    )
    assert q.patterns == [(sp.Var("b"), sp.Uri("http://p/has"), sp.Var("a"))]


def test_inverse_path_semantics(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?child ?parent "
        "WHERE { ?child ^p:has ?parent . } ORDER BY ?child",
    ).collect()
    B = "http://b/"
    assert sorted((r.child, r.parent) for r in rows) == sorted([
        (B + "d1", "c1"), (B + "x1", B + "d1"), (B + "leaf", B + "x1"),
    ])


def test_inverse_closure_swaps_endpoints(path_edges):
    # ^(p:has+) from leaf reaches every ancestor
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> PREFIX b: <http://b/> "
        "SELECT ?anc WHERE { b:leaf ^p:has+ ?anc . } ORDER BY ?anc",
    ).collect()
    B = "http://b/"
    assert [r.anc for r in rows] == sorted(["c1", B + "d1", B + "x1"])


def test_alternation_single_slice_semantics(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b "
        "WHERE { ?a p:has|p:other ?b . } ORDER BY ?a ?b",
    ).collect()
    B = "http://b/"
    assert sorted((r.a, r.b) for r in rows) == sorted([
        ("c1", B + "d1"), (B + "d1", B + "x1"), (B + "x1", B + "leaf"),
        ("c1", B + "d9"),
    ])


def test_alternation_mixed_inverse(path_edges):
    # p:other|^p:has from c1: d9 (forward other) — c1 has no has-parent
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?x "
        "WHERE { <c1> p:other|^p:has ?x . }",
    ).collect()
    assert [r.x for r in rows] == ["http://b/d9"]
    # and from d1: x1 arrives via ^has (d1's has-parent is c1 -> c1 via ^has)
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> PREFIX b: <http://b/> SELECT ?x "
        "WHERE { b:d1 p:other|^p:has ?x . } ORDER BY ?x",
    ).collect()
    assert [r.x for r in rows] == ["c1"]


def test_alternation_closure(path_edges):
    # (has|other)+ from c1 reaches d9 as well as the has-chain
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b "
        "WHERE { <c1> (p:has|p:other)+ ?b . } ORDER BY ?b",
    ).collect()
    B = "http://b/"
    assert [r.b for r in rows] == sorted([B + "d1", B + "x1", B + "leaf", B + "d9"])


def test_inverse_alternation_distributes():
    q = sp.parse_sparql(
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a ^(p:x|p:y) ?b . }"
    )
    (_, p, _) = q.patterns[0]
    assert isinstance(p, sp.PathAlt)
    assert all(st.inverse for st in p.steps)


def test_union_standalone(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE "
        "{ { ?a p:other ?b } UNION { ?a p:note ?b } }",
    ).collect()
    assert sorted((r.a, r.b) for r in rows) == sorted([
        ("c1", "http://b/d9"), ("http://b/d1", "lit"),
    ])


def test_union_joined_with_base_bgp(path_edges):
    # base pattern anchors ?a to c1's children; union adds the second hop
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE {"
        " <c1> p:has ?a ."
        " { ?a p:has ?b } UNION { ?a p:note ?b } }",
    ).collect()
    B = "http://b/"
    assert sorted((r.a, r.b) for r in rows) == sorted([
        (B + "d1", B + "x1"), (B + "d1", "lit"),
    ])


def test_union_multiset_keeps_duplicates(path_edges):
    # the same (a,b) solution from both branches must appear twice
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE "
        "{ { ?a p:other ?b } UNION { ?a p:other ?b } }",
    ).collect()
    assert len(rows) == 2
    # ...and DISTINCT collapses them
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT DISTINCT ?a ?b WHERE "
        "{ { ?a p:other ?b } UNION { ?a p:other ?b } }",
    ).collect()
    assert len(rows) == 1


def test_union_mismatched_branch_vars_raises(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a WHERE "
            "{ { ?a p:other ?b } UNION { ?a p:note ?c } }",
        )


def test_union_nested_filter_raises():
    with pytest.raises(sp.SparqlUnsupported):
        sp.parse_sparql(
            "PREFIX p: <http://p/> SELECT ?a WHERE "
            "{ { ?a p:x ?b . FILTER (?a IN (<u>)) } UNION { ?a p:y ?b } }"
        )


def test_alternation_of_closures_raises():
    with pytest.raises(sp.SparqlUnsupported):
        sp.parse_sparql(
            "PREFIX p: <http://p/> SELECT ?a WHERE { ?a p:x+|p:y ?b . }"
        )


# --- MINUS / VALUES / extended FILTERs ----------------------------------------

def test_minus_anti_join(path_edges):
    # subjects with a has-edge MINUS those that also carry a note
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a WHERE "
        "{ ?a p:has ?b . MINUS { ?a p:note ?n } } ORDER BY ?a",
    ).collect()
    assert [r.a for r in rows] == ["c1", "http://b/x1"]  # d1 has a note


def test_minus_disjoint_domain_is_noop(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE "
        "{ ?a p:other ?b . MINUS { ?x p:note ?n } }",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [("c1", "http://b/d9")]


def test_minus_on_optional_bound_var_raises(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a WHERE { ?a p:has ?b . "
            "OPTIONAL { ?a p:note ?n } MINUS { ?x p:note ?n } }",
        )


def test_values_single_var_join(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE "
        "{ ?a p:has ?b . VALUES ?a { <c1> <http://b/x1> } } ORDER BY ?a",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [
        ("c1", "http://b/d1"), ("http://b/x1", "http://b/leaf"),
    ]


def test_values_multi_var_with_undef_nonjoin_col(path_edges):
    # ?tag is new (not a join var) so UNDEF is allowed there -> NULL
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?tag WHERE "
        '{ ?a p:other ?b . VALUES (?a ?tag) { (<c1> "root") (<zz> UNDEF) } }',
    ).collect()
    assert [(r.a, r.tag) for r in rows] == [("c1", "root")]


def test_values_undef_in_join_var_raises(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a WHERE "
            "{ ?a p:other ?b . VALUES ?a { UNDEF } }",
        )


def test_filter_regex_and_flags(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?n WHERE "
        '{ ?a p:note ?n . FILTER regex(?n, "^LI", "i") }',
    ).collect()
    assert [r.n for r in rows] == ["lit"]
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?n WHERE "
        '{ ?a p:note ?n . FILTER regex(?n, "^LI") }',
    ).collect()
    assert rows == []


def test_filter_neq_and_strstarts(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b WHERE "
        '{ <c1> p:has|p:other ?b . FILTER (?b != <http://b/d9> && STRSTARTS(?b, "http://b/")) }',
    ).collect()
    assert [r.b for r in rows] == ["http://b/d1"]


def test_filter_contains(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b WHERE "
        '{ ?a p:other ?b . FILTER CONTAINS(?b, "d9") }',
    ).collect()
    assert [r.b for r in rows] == ["http://b/d9"]


def test_filter_unsupported_operator_raises():
    with pytest.raises(sp.SparqlError):
        sp.parse_sparql(
            'PREFIX p: <http://p/> SELECT ?t WHERE { ?d p:x ?t . FILTER (?t ~ "z") }'
        )


# --- aggregates / GROUP BY ----------------------------------------------------

def test_group_by_count(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a (COUNT(?b) AS ?n) WHERE "
        "{ ?a p:has|p:other ?b . } GROUP BY ?a ORDER BY ?a",
    ).collect()
    assert [(r.a, r.n) for r in rows] == [
        ("c1", 2), ("http://b/d1", 1), ("http://b/x1", 1),
    ]


def test_global_aggregates(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT (COUNT(*) AS ?n) "
        "(COUNT(DISTINCT ?a) AS ?na) (MIN(?b) AS ?mn) (MAX(?b) AS ?mx) "
        "WHERE { ?a p:has ?b . }",
    ).collect()
    r = rows[0]
    assert (r.n, r.na) == (3, 3)
    assert r.mn == "http://b/d1" and r.mx == "http://b/x1"


def test_sum_avg_numeric_cast(spark):
    B = "http://b/"
    rows = [
        (B + "s1", "http://p/v", "2", "literal", None, None),
        (B + "s1", "http://p/v", "3", "literal", None, None),
        (B + "s2", "http://p/v", "5", "literal", None, None),
        (B + "s2", "http://p/v", "oops", "literal", None, None),  # non-numeric
    ]
    cols = [f.name for f in EDGES.fields]
    data = [r + (None,) * (len(cols) - len(r)) for r in rows]
    df = spark.createDataFrame(data, schema=EDGES)
    got = sp.compile_sparql(
        df,
        "PREFIX p: <http://p/> SELECT ?s (SUM(?v) AS ?t) (AVG(?v) AS ?m) "
        "WHERE { ?s p:v ?v . } GROUP BY ?s ORDER BY ?s",
    ).collect()
    assert [(r.s, r.t, r.m) for r in got] == [
        (B + "s1", 5.0, 2.5), (B + "s2", 5.0, 5.0),
    ]


def test_selected_var_not_grouped_raises(path_edges):
    with pytest.raises(sp.SparqlError):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a ?b (COUNT(?b) AS ?n) WHERE "
            "{ ?a p:has ?b . } GROUP BY ?a",
        )


def test_aggregate_on_unbound_var_raises(path_edges):
    with pytest.raises(sp.SparqlError):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT (COUNT(?zz) AS ?n) WHERE "
            "{ ?a p:has ?b . }",
        )


# --- ASK / CONSTRUCT / DESCRIBE -----------------------------------------------

def test_ask_true_false(path_edges):
    assert sp.compile_query(
        path_edges, "PREFIX p: <http://p/> ASK { ?a p:note ?n }"
    ).collect()[0].ask is True
    assert sp.compile_query(
        path_edges, "PREFIX p: <http://p/> ASK WHERE { ?a p:nope ?n }"
    ).collect()[0].ask is False


def test_construct_swapped_direction_and_typing(path_edges):
    got = sorted(
        tuple(r)
        for r in sp.compile_query(
            path_edges,
            "PREFIX p: <http://p/> CONSTRUCT { "
            "?b <urn:child-of> ?a . ?b a <urn:Child> } "
            "WHERE { ?a p:has ?b . }",
        ).collect()
    )
    B = "http://b/"
    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    want = sorted(
        [(B + c, "urn:child-of", p, "uri", None, None)
         for c, p in (("d1", "c1"), ("x1", B + "d1"), ("leaf", B + "x1"))]
        + [(B + c, RT, "urn:Child", "uri", None, None)
           for c in ("d1", "x1", "leaf")]
    )
    assert got == want


def test_construct_carries_literal_metadata(spark):
    B = "http://b/"
    rows = [
        (B + "s1", "http://p/t", "hello", "literal", "en", None),
        (B + "s2", "http://p/t", "5", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        (B + "s3", "http://p/t", B + "other", "uri", None, None),
    ]
    cols = [f.name for f in EDGES.fields]
    data = [r + (None,) * (len(cols) - len(r)) for r in rows]
    df = spark.createDataFrame(data, schema=EDGES)
    got = sorted(
        tuple(r)
        for r in sp.compile_query(
            df,
            "PREFIX p: <http://p/> CONSTRUCT { ?s <urn:label> ?t } "
            "WHERE { ?s p:t ?t . }",
        ).collect()
    )
    assert got == sorted([
        (B + "s1", "urn:label", "hello", "literal", "en", None),
        (B + "s2", "urn:label", "5", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        (B + "s3", "urn:label", B + "other", "uri", None, None),
    ])


def test_construct_drops_literal_subject_instantiations(spark):
    B = "http://b/"
    rows = [
        (B + "s1", "http://p/t", "textval", "literal", None, None),
        (B + "s2", "http://p/t", B + "u1", "uri", None, None),
    ]
    cols = [f.name for f in EDGES.fields]
    data = [r + (None,) * (len(cols) - len(r)) for r in rows]
    df = spark.createDataFrame(data, schema=EDGES)
    # ?t in subject position: the literal binding must be skipped, not emitted
    got = [
        tuple(r)
        for r in sp.compile_query(
            df,
            "PREFIX p: <http://p/> CONSTRUCT { ?t <urn:from> ?s } "
            "WHERE { ?s p:t ?t . }",
        ).collect()
    ]
    assert got == [(B + "u1", "urn:from", B + "s2", "uri", None, None)]


def test_construct_literal_object_template(path_edges):
    got = [
        tuple(r)
        for r in sp.compile_query(
            path_edges,
            'PREFIX p: <http://p/> CONSTRUCT { ?a <urn:mark> "seen"@en } '
            "WHERE { ?a p:other ?b . }",
        ).collect()
    ]
    assert got == [("c1", "urn:mark", "seen", "literal", "en", None)]


def test_construct_with_filter(path_edges):
    got = [
        tuple(r)
        for r in sp.compile_query(
            path_edges,
            "PREFIX p: <http://p/> CONSTRUCT { ?a <urn:kept> ?b } "
            'WHERE { ?a p:has ?b . FILTER CONTAINS(?b, "leaf") }',
        ).collect()
    ]
    assert got == [
        ("http://b/x1", "urn:kept", "http://b/leaf", "uri", None, None)
    ]


def test_construct_is_a_set(path_edges):
    # two template triples collapsing to the same output triple -> one row
    got = sp.compile_query(
        path_edges,
        "PREFIX p: <http://p/> CONSTRUCT { ?a a <urn:T> . ?a a <urn:T> } "
        "WHERE { ?a p:has ?b . }",
    ).collect()
    assert len(got) == 3  # c1, d1, x1 — deduped across templates


def test_describe_var(path_edges):
    got = sorted(
        (r.subj, r.pred, r.obj)
        for r in sp.compile_query(
            path_edges,
            "PREFIX p: <http://p/> DESCRIBE ?a WHERE { <c1> p:has ?a . }",
        ).collect()
    )
    B = "http://b/"
    assert got == sorted([
        (B + "d1", "http://p/has", B + "x1"),
        (B + "d1", "http://p/note", "lit"),
    ])


def test_describe_uris_without_where(path_edges):
    got = sorted(
        (r.subj, r.obj)
        for r in sp.compile_query(
            path_edges, "DESCRIBE <c1> <http://b/x1>"
        ).collect()
    )
    B = "http://b/"
    assert got == sorted([
        ("c1", B + "d1"), ("c1", B + "d9"), (B + "x1", B + "leaf"),
    ])


def test_compile_sparql_rejects_other_forms(path_edges):
    with pytest.raises(sp.SparqlError):
        sp.compile_sparql(path_edges, "PREFIX p: <http://p/> ASK { ?a p:x ?b }")


# --- HAVING / BIND --------------------------------------------------------------

def test_having_filters_groups(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a (COUNT(?b) AS ?n) WHERE "
        "{ ?a p:has|p:other ?b . } GROUP BY ?a HAVING (?n >= 2) ORDER BY ?a",
    ).collect()
    assert [(r.a, r.n) for r in rows] == [("c1", 2)]


def test_having_without_aggregation_raises(path_edges):
    with pytest.raises(sp.SparqlError):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a WHERE { ?a p:has ?b . } "
            'HAVING (?a = "x")',
        ).collect()


def test_bind_concat_and_case(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b ?tag WHERE { <c1> p:has ?b . "
        'BIND(UCASE(CONCAT("x-", ?b)) AS ?tag) }',
    ).collect()
    assert [(r.b, r.tag) for r in rows] == [
        ("http://b/d1", "X-HTTP://B/D1"),
    ]


def test_bind_sha256_matches_python(path_edges):
    import hashlib

    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b ?u WHERE { <c1> p:has ?b . "
        'BIND(IRI(CONCAT("urn:skolem:", SHA256(?b))) AS ?u) }',
    ).collect()
    want = "urn:skolem:" + hashlib.sha256(b"http://b/d1").hexdigest()
    assert [(r.b, r.u) for r in rows] == [("http://b/d1", want)]


def test_bind_target_in_pattern_raises(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?x WHERE { ?a p:has ?x . "
            'BIND(STR(?a) AS ?x) }',
        )


def test_bind_unbound_ref_raises(path_edges):
    with pytest.raises(sp.SparqlError):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?x WHERE { ?a p:has ?b . "
            'BIND(STR(?zz) AS ?x) }',
        )


def test_construct_with_bind_minted_uri(path_edges):
    import hashlib

    got = [
        tuple(r)
        for r in sp.compile_query(
            path_edges,
            "PREFIX p: <http://p/> CONSTRUCT { ?u <urn:for> ?b } WHERE "
            "{ <c1> p:has ?b . BIND(IRI(CONCAT(\"urn:s:\", SHA256(?b))) AS ?u) }",
        ).collect()
    ]
    want_u = "urn:s:" + hashlib.sha256(b"http://b/d1").hexdigest()
    assert got == [(want_u, "urn:for", "http://b/d1", "uri", None, None)]


def test_construct_bind_literal_in_subject_raises(path_edges):
    with pytest.raises(sp.SparqlError):
        sp.compile_query(
            path_edges,
            "PREFIX p: <http://p/> CONSTRUCT { ?u <urn:for> ?b } WHERE "
            '{ <c1> p:has ?b . BIND(STR(?b) AS ?u) }',
        )


def test_construct_bind_literal_object_kind(path_edges):
    got = [
        tuple(r)
        for r in sp.compile_query(
            path_edges,
            "PREFIX p: <http://p/> CONSTRUCT { ?b <urn:tag> ?t } WHERE "
            '{ <c1> p:has ?b . BIND(LCASE("SEEN") AS ?t) }',
        ).collect()
    ]
    assert got == [("http://b/d1", "urn:tag", "seen", "literal", None, None)]


# --- zero-or-more (p*) / zero-or-one (p?) paths --------------------------------

def test_star_path_includes_identity(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b WHERE { <c1> p:has* ?b . } ORDER BY ?b",
    ).collect()
    B = "http://b/"
    # c1 itself (zero hops) plus the full has-closure
    assert [r.b for r in rows] == sorted(["c1", B + "d1", B + "x1", B + "leaf"])


def test_star_path_identity_covers_literals(path_edges):
    # zero-length paths relate every term in the graph to itself,
    # including literal objects ("lit")
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?x WHERE "
        '{ ?x p:nosuch* ?x2 . FILTER (?x = "lit") }',
    ).collect()
    assert len(rows) == 1


def test_opt_path_zero_or_one(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b WHERE { <c1> p:has? ?b . } ORDER BY ?b",
    ).collect()
    # c1 itself plus its direct has-child only (no deeper closure)
    assert [r.b for r in rows] == sorted(["c1", "http://b/d1"])


def test_inverse_star(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> PREFIX b: <http://b/> "
        "SELECT ?anc WHERE { b:x1 ^(p:has*) ?anc . } ORDER BY ?anc",
    ).collect()
    B = "http://b/"
    assert [r.anc for r in rows] == sorted(["c1", B + "d1", B + "x1"])


# --- sub-SELECT -----------------------------------------------------------------

def test_subselect_aggregate_then_enrich(path_edges):
    # inner: out-degree per node over has|other; outer: join the note label
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?n ?note WHERE { "
        "{ SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a p:has|p:other ?b . } "
        "GROUP BY ?a } "
        "OPTIONAL { ?a p:note ?note } } ORDER BY ?a",
    ).collect()
    B = "http://b/"
    assert [(r.a, r.n, r.note) for r in rows] == [
        ("c1", 2, None), (B + "d1", 1, "lit"), (B + "x1", 1, None),
    ]


def test_subselect_joined_with_outer_pattern(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b ?n WHERE { "
        "?a p:has ?b . "
        "{ SELECT ?a (COUNT(?x) AS ?n) WHERE { ?a p:has ?x . } GROUP BY ?a } "
        "} ORDER BY ?a",
    ).collect()
    assert [(r.a, r.n) for r in rows] == [
        ("c1", 1), ("http://b/d1", 1), ("http://b/x1", 1),
    ]


def test_subselect_limit_is_local(path_edges):
    # the inner LIMIT applies to the subquery, not the outer result
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { "
        "?a p:has ?b . "
        "{ SELECT ?a WHERE { ?a p:has ?x . } ORDER BY ?a LIMIT 1 } }",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [("c1", "http://b/d1")]


def test_subselect_projecting_unbound_raises(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a WHERE { "
            "?a p:has ?b . { SELECT ?a ?zz WHERE { ?a p:has ?x . } } }",
        )


# --- FILTER [NOT] EXISTS ---------------------------------------------------------

def test_filter_exists_semi_join(path_edges):
    # keep only pairs whose object carries a p:note edge
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { "
        "?a p:has ?b . FILTER EXISTS { ?b p:note ?n } } ORDER BY ?a",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [("c1", "http://b/d1")]


def test_filter_not_exists_anti_join(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { "
        "?a p:has ?b . FILTER NOT EXISTS { ?b p:note ?n } } ORDER BY ?a",
    ).collect()
    B = "http://b/"
    assert [(r.a, r.b) for r in rows] == [
        (B + "d1", B + "x1"), (B + "x1", B + "leaf"),
    ]


def test_exists_vars_stay_local(path_edges):
    # ?n is bound only inside EXISTS: outside the group it is unbound, so
    # projecting it yields NULL (the module's unbound-projection rule)
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?n WHERE { "
        "?a p:has ?b . FILTER EXISTS { ?b p:note ?n } }",
    ).collect()
    assert [(r.a, r.n) for r in rows] == [("c1", None)]


def test_exists_disjoint_group_raises(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a WHERE { "
            "?a p:has ?b . FILTER EXISTS { ?x p:note ?n } }",
        )


def test_exists_on_optional_bound_var_raises(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            path_edges,
            "PREFIX p: <http://p/> SELECT ?a WHERE { "
            "?a p:has ?b . OPTIONAL { ?b p:has ?c } "
            "FILTER NOT EXISTS { ?c p:has ?d } }",
        )


# --- GROUP_CONCAT / SAMPLE -------------------------------------------------------

def test_group_concat_sorted_with_separator(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?a (GROUP_CONCAT(?b; SEPARATOR=",") AS ?bs) WHERE { '
        "?a p:has|p:other ?b . } GROUP BY ?a ORDER BY ?a",
    ).collect()
    B = "http://b/"
    assert [(r.a, r.bs) for r in rows] == [
        ("c1", f"{B}d1,{B}d9"), (B + "d1", B + "x1"), (B + "x1", B + "leaf"),
    ]


def test_group_concat_default_separator_and_distinct(path_edges):
    # p:has|p:has duplicates every solution; DISTINCT collapses them
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> "
        "SELECT ?a (GROUP_CONCAT(DISTINCT ?b) AS ?bs) WHERE { "
        "?a p:has ?b . ?a p:has ?b2 . } GROUP BY ?a ORDER BY ?a",
    ).collect()
    assert rows[0].a == "c1" and rows[0].bs == "http://b/d1"


def test_sample_is_deterministic_min(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> "
        "SELECT ?a (SAMPLE(?b) AS ?sb) WHERE { "
        "?a p:has|p:other ?b . } GROUP BY ?a ORDER BY ?a",
    ).collect()
    assert rows[0].a == "c1" and rows[0].sb == "http://b/d1"


# --- variable-to-variable FILTER ---------------------------------------------------

def test_filter_var_neq_var(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b ?c WHERE { "
        "?a p:has ?b . ?a p:other ?c . FILTER (?b != ?c) }",
    ).collect()
    assert [(r.b, r.c) for r in rows] == [("http://b/d1", "http://b/d9")]


def test_filter_var_eq_var(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?b ?c WHERE { "
        "?a p:has ?b . ?a p:other ?c . FILTER (?b = ?c) }",
    ).collect()
    assert rows == []


def test_construct_honors_not_exists(path_edges):
    # without the anti-join, d1 (which has a note) would also be emitted
    rows = sp.compile_construct(
        path_edges,
        "PREFIX p: <http://p/> CONSTRUCT { ?b <http://out/noteless> ?a } "
        "WHERE { ?a p:has ?b . FILTER NOT EXISTS { ?b p:note ?n } }",
    ).collect()
    B = "http://b/"
    assert sorted((r.subj, r.obj) for r in rows) == [
        (B + "leaf", B + "x1"), (B + "x1", B + "d1"),
    ]


def test_construct_refuses_subselect(path_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_construct(
            path_edges,
            "PREFIX p: <http://p/> CONSTRUCT { ?a <http://out/x> ?b } "
            "WHERE { ?a p:has ?b . { SELECT ?a WHERE { ?a p:note ?n } } }",
        )


# --- SELECT * / predicate-object lists / OFFSET ------------------------------------

def test_select_star_projects_sorted_bound_vars(path_edges):
    df = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT * WHERE { ?b p:note ?note . "
        "?a p:has ?b . }",
    )
    assert df.columns == ["a", "b", "note"]
    rows = df.collect()
    assert [(r.a, r.b, r.note) for r in rows] == [
        ("c1", "http://b/d1", "lit"),
    ]


def test_select_star_hides_sequence_hop_vars(path_edges):
    df = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT * WHERE { ?a p:has/p:has ?b . }",
    )
    assert df.columns == ["a", "b"]


def test_predicate_object_lists_desugar(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b ?c WHERE { "
        "?a p:has ?b ; p:other ?c . }",
    ).collect()
    assert [(r.a, r.b, r.c) for r in rows] == [
        ("c1", "http://b/d1", "http://b/d9"),
    ]


def test_object_list_shares_subject_and_predicate(path_edges):
    q = sp.parse_sparql(
        "PREFIX p: <http://p/> SELECT ?a WHERE { ?a p:has ?x , ?y . }"
    )
    assert q.patterns == [
        (sp.Var("a"), sp.Uri("http://p/has"), sp.Var("x")),
        (sp.Var("a"), sp.Uri("http://p/has"), sp.Var("y")),
    ]


def test_trailing_semicolon_is_legal(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a p:other ?b ; . }",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [("c1", "http://b/d9")]


def test_offset_with_order_by(path_edges):
    rows = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a p:has ?b . } "
        "ORDER BY ?a OFFSET 1 LIMIT 1",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [("http://b/d1", "http://b/x1")]


def test_offset_without_order_is_deterministic(path_edges):
    # OFFSET alone triggers the projected-var ordering convention:
    # page 2 + page 1 == the full ordered result
    full = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a p:has ?b . } "
        "ORDER BY ?a ?b",
    ).collect()
    page1 = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a p:has ?b . } LIMIT 2",
    ).collect()
    page2 = sp.compile_sparql(
        path_edges,
        "PREFIX p: <http://p/> SELECT ?a ?b WHERE { ?a p:has ?b . } "
        "OFFSET 2 LIMIT 2",
    ).collect()
    assert page1 + page2 == full


# --- negated property sets + extended FILTER builtins (round 3) --------------


def test_negated_property_set(tiny_edges):
    # !(title|rdf:type) over s1/s2: every edge whose pred is neither
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX p: <http://p/> "
        "SELECT ?s ?o WHERE { ?s !(p:title|rdf:type) ?o . } ORDER BY ?s ?o",
    ).collect()
    assert [(r.s, r.o) for r in rows] == [("s2", "3"), ("s2", "hello")]


def test_negated_single_pred(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX dcat: <http://www.w3.org/ns/dcat#> "
        "PREFIX p: <http://p/> "
        "SELECT ?o WHERE { ?s rdf:type dcat:Dataset . ?s !p:title ?o . "
        "FILTER (?o != <http://www.w3.org/ns/dcat#Dataset>) } ORDER BY ?o",
    ).collect()
    assert [r.o for r in rows] == ["3", "hello"]


@pytest.mark.parametrize(
    "text",
    [
        # inverse member inside a negated set
        "PREFIX p: <http://p/> SELECT ?s WHERE { ?s !(^p:title) ?o . }",
        # modifier over a negated set
        "PREFIX p: <http://p/> SELECT ?s WHERE { ?s !(p:title)+ ?o . }",
        # inverse of a negated set
        "PREFIX p: <http://p/> SELECT ?s WHERE { ?s ^!p:title ?o . }",
    ],
)
def test_negated_property_set_refusals(text):
    with pytest.raises(sp.SparqlUnsupported):
        sp.parse_sparql(text)


def test_filter_bound_and_not_bound(tiny_edges):
    base = (
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX dcat: <http://www.w3.org/ns/dcat#> "
        "PREFIX p: <http://p/> "
        "SELECT ?s WHERE {{ ?s rdf:type dcat:Dataset . "
        "OPTIONAL {{ ?s p:size ?sz }} FILTER ({}BOUND(?sz)) }}"
    )
    has = sp.compile_sparql(tiny_edges, base.format("")).collect()
    not_has = sp.compile_sparql(tiny_edges, base.format("!")).collect()
    assert [r.s for r in has] == ["s2"]
    assert [r.s for r in not_has] == ["s1"]


def test_filter_strends_strlen_and_ordering(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s ?t WHERE { ?s p:title ?t . '
        'FILTER (STRENDS(?t, "llo") && STRLEN(?t) >= 5 && ?t > "h" && ?t < "i") }',
    ).collect()
    assert sorted((r.s, r.t) for r in rows) == [("s1", "hello"), ("s1", "hello")]


def test_filter_numeric_comparison(tiny_edges):
    # "3"^^xsd:int passes > 2; "hello" casts to NULL and drops (type error)
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        "SELECT ?s ?v WHERE { ?s !p:nothing ?v . FILTER (?v > 2) }",
    ).collect()
    assert [(r.s, r.v) for r in rows] == [("s2", "3")]
    none = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        "SELECT ?s WHERE { ?s p:size ?v . FILTER (?v > 3.5) }",
    ).collect()
    assert none == []


def test_filter_var_to_var_ordering(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        "SELECT ?a ?b WHERE { ?s p:size ?a . ?s p:link ?b . FILTER (?a < ?b) }",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [("3", "hello")]


def test_filter_iri_ordering_refused():
    with pytest.raises(sp.SparqlUnsupported):
        sp.parse_sparql(
            "PREFIX p: <http://p/> "
            "SELECT ?s WHERE { ?s p:link ?o . FILTER (?o < <http://z>) }"
        )


# --- term-metadata FILTER builtins: LANG / DATATYPE / isURI / isLiteral ------


def test_filter_lang(tiny_edges):
    base = (
        "PREFIX p: <http://p/> "
        'SELECT ?s WHERE {{ ?s p:title ?t . FILTER (LANG(?t) {} "{}") }}'
    )
    en = sp.compile_sparql(tiny_edges, base.format("=", "en")).collect()
    plain = sp.compile_sparql(tiny_edges, base.format("=", "")).collect()
    not_en = sp.compile_sparql(tiny_edges, base.format("!=", "en")).collect()
    assert [r.s for r in en] == ["s1"]      # the @en row only
    assert [r.s for r in plain] == ["s1"]   # the untagged row only
    assert [r.s for r in not_en] == ["s1"]  # ditto (LANG()="" != "en")


def test_filter_langmatches(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s ?t WHERE { ?s p:title ?t . '
        'FILTER LANGMATCHES(LANG(?t), "EN") }',
    ).collect()
    assert len(rows) == 1  # case-insensitive; plain literal has LANG ""
    star = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s WHERE { ?s p:title ?t . FILTER LANGMATCHES(LANG(?t), "*") }',
    ).collect()
    assert len(star) == 1  # any non-empty tag


def test_filter_datatype(tiny_edges):
    got = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?v WHERE { ?s p:size ?v . FILTER (DATATYPE(?v) = xsd:int) }",
    ).collect()
    assert [r.v for r in got] == ["3"]
    # untagged plain literal -> xsd:string; @en row -> rdf:langString
    plain = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?t WHERE { ?s p:title ?t . FILTER (DATATYPE(?t) = xsd:string) }",
    ).collect()
    lstr = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "SELECT ?t WHERE { ?s p:title ?t . "
        "FILTER (DATATYPE(?t) = rdf:langString) }",
    ).collect()
    assert len(plain) == 1 and len(lstr) == 1
    # DATATYPE of a URI is a type error -> row drops
    uri = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?o WHERE { ?s p:link ?o . FILTER (DATATYPE(?o) = xsd:string) }",
    ).collect()
    assert uri == []


def test_filter_kind_tests(tiny_edges):
    q = (
        "PREFIX p: <http://p/> "
        "SELECT ?o WHERE {{ ?s ?pp ?o . FILTER {} }}"
    )
    uris = {r.o for r in sp.compile_sparql(tiny_edges, q.format("isURI(?o)")).collect()}
    lits = {r.o for r in sp.compile_sparql(tiny_edges, q.format("isLiteral(?o)")).collect()}
    not_lit = {r.o for r in sp.compile_sparql(tiny_edges, q.format("(!isLiteral(?o))")).collect()}
    blanks = sp.compile_sparql(tiny_edges, q.format("isBlank(?o)")).collect()
    assert "hello" in lits and "3" in lits
    assert uris == not_lit and "hello" in uris  # the p:link URI object
    assert blanks == []  # the store is skolemized — no bnodes by construction


def test_filter_lang_on_uri_is_type_error(tiny_edges):
    got = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?o WHERE { ?s p:link ?o . FILTER (LANG(?o) = "") }',
    ).collect()
    assert got == []


def test_filter_lang_over_optional_unbound_drops(tiny_edges):
    # LANG of an OPTIONAL-unbound var is a type error -> row drops
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX dcat: <http://www.w3.org/ns/dcat#> "
        "PREFIX p: <http://p/> "
        "SELECT ?s WHERE { ?s rdf:type dcat:Dataset . "
        'OPTIONAL { ?s p:size ?sz } FILTER (LANG(?sz) = "") }',
    ).collect()
    assert [r.s for r in rows] == ["s2"]  # s1 has no p:size -> dropped


def test_filter_meta_on_path_var_refused(tiny_edges):
    with pytest.raises(sp.SparqlUnsupported):
        sp.compile_sparql(
            tiny_edges,
            "PREFIX p: <http://p/> "
            'SELECT ?o WHERE { ?s p:title+ ?o . FILTER (LANG(?o) = "en") }',
        )


# --- FILTER || / && precedence (round 3) --------------------------------------


def test_filter_or_disjunction(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s ?v WHERE { ?s !p:none ?v . '
        'FILTER (?v = "3" || ?v = "hello") }',
    ).collect()
    # every non-type edge with those lexical forms: hello@en + plain hello
    # (titles), "3" (size), hello (link URI)
    assert len(rows) == 4


def test_filter_and_binds_tighter_than_or(tiny_edges):
    # (A && B) || C — not A && (B || C): the "3" row fails STRSTARTS but
    # passes the ?v = "3" alternative
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s ?v WHERE { ?s p:size ?v . '
        'FILTER (STRSTARTS(?v, "h") && STRLEN(?v) > 2 || ?v = "3") }',
    ).collect()
    assert [(r.s, r.v) for r in rows] == [("s2", "3")]


def test_filter_nested_parens_and_meta_inside_or(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s ?t WHERE { ?s p:title ?t . '
        'FILTER ((LANG(?t) = "en" || LANG(?t) = "") && STRSTARTS(?t, "h")) }',
    ).collect()
    assert len(rows) == 2  # both title rows (tagged + plain)


def test_filter_in_under_or_compiles_as_isin(tiny_edges):
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s WHERE { ?s p:size ?v . '
        'FILTER (?v IN ("nope") || ?v IN ("3")) }',
    ).collect()
    assert [r.s for r in rows] == ["s2"]


def test_filter_or_null_semantics_matches_sparql(tiny_edges):
    # error || true = true: rows where ?z is OPTIONAL-unbound still pass
    # via the right alternative; error || false drops
    base = (
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX dcat: <http://www.w3.org/ns/dcat#> "
        "PREFIX p: <http://p/> "
        "SELECT ?s WHERE {{ ?s rdf:type dcat:Dataset . "
        "OPTIONAL {{ ?s p:size ?z }} FILTER (?z = \"3\" || {}) }}"
    )
    t = sp.compile_sparql(tiny_edges, base.format("STRLEN(?s) = 2")).collect()
    f = sp.compile_sparql(tiny_edges, base.format("STRLEN(?s) = 9")).collect()
    assert sorted(r.s for r in t) == ["s1", "s2"]
    assert [r.s for r in f] == ["s2"]


def test_filter_str_lexical_comparison(tiny_edges):
    # STR(?v) = "3": lexical-form equality over literal AND uri bindings
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s WHERE { ?s p:size ?v . FILTER (STR(?v) = "3") }',
    ).collect()
    assert [r.s for r in rows] == ["s2"]
    # and inside a || tree: STR over URI bindings (the class URIs) too
    rows = sp.compile_sparql(
        tiny_edges,
        "PREFIX p: <http://p/> "
        'SELECT ?s ?v WHERE { ?s !p:none ?v . '
        'FILTER (STR(?v) = "3" || STRSTARTS(?v, "http://www.w3")) }',
    ).collect()
    assert len(rows) == 3  # the "3" literal + the two rdf:type class URIs
