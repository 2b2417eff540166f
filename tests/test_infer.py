"""RDFS entailment materialization (operators/infer.py) — ρdf rule subset
(rdfs2/3/7/9 + transitive closures), broadcast-schema dataflow."""

import pytest

from breg_dcat_harvester_spark.operators.infer import (
    DOMAIN,
    RANGE,
    SUBCLASS,
    SUBPROP,
    rdfs_closure,
)
from breg_dcat_harvester_spark.schema import RDF_TYPE, TRIPLE_STRUCT


def _g(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_STRUCT)


BASE = [
    ("urn:d1", RDF_TYPE, "urn:Dataset", "uri", None, None),
    ("urn:d1", "urn:title", "hello", "literal", "en", None),
    ("urn:d1", "urn:theme", "urn:t1", "uri", None, None),
    ("urn:Dataset", SUBCLASS, "urn:Resource", "uri", None, None),
    ("urn:Resource", SUBCLASS, "urn:Node", "uri", None, None),
    ("urn:title", SUBPROP, "urn:label", "uri", None, None),
    ("urn:theme", DOMAIN, "urn:Themed", "uri", None, None),
    ("urn:theme", RANGE, "urn:Concept", "uri", None, None),
]


def test_all_rules_fire(spark):
    out = {(r.subj, r.pred, r.obj) for r in rdfs_closure(_g(spark, BASE)).collect()}
    assert ("urn:d1", RDF_TYPE, "urn:Resource") in out        # rdfs9
    assert ("urn:d1", RDF_TYPE, "urn:Node") in out            # rdfs9 + rdfs11
    assert ("urn:d1", "urn:label", "hello") in out            # rdfs7
    assert ("urn:d1", RDF_TYPE, "urn:Themed") in out          # rdfs2
    assert ("urn:t1", RDF_TYPE, "urn:Concept") in out         # rdfs3
    assert ("urn:Dataset", SUBCLASS, "urn:Node") in out       # rdfs11
    # asserted triples survive unchanged
    assert ("urn:d1", RDF_TYPE, "urn:Dataset") in out


def test_rdfs7_carries_literal_metadata(spark):
    rows = [r for r in rdfs_closure(_g(spark, BASE)).collect() if r.pred == "urn:label"]
    assert len(rows) == 1
    assert (rows[0].obj, rows[0].obj_kind, rows[0].lang) == ("hello", "literal", "en")


def test_derived_property_triggers_domain_range(spark):
    # x p y, p ⊑ q, domain(q)=C  ⇒  x a C (rule ordering: rdfs7 first)
    rows = [
        ("urn:x", "urn:p", "urn:y", "uri", None, None),
        ("urn:p", SUBPROP, "urn:q", "uri", None, None),
        ("urn:q", DOMAIN, "urn:C", "uri", None, None),
        ("urn:q", RANGE, "urn:D", "uri", None, None),
    ]
    out = {(r.subj, r.pred, r.obj) for r in rdfs_closure(_g(spark, rows)).collect()}
    assert ("urn:x", RDF_TYPE, "urn:C") in out
    assert ("urn:y", RDF_TYPE, "urn:D") in out


def test_range_skips_literal_objects(spark):
    rows = [
        ("urn:x", "urn:p", "a literal", "literal", None, None),
        ("urn:p", RANGE, "urn:C", "uri", None, None),
    ]
    out = {(r.subj, r.pred, r.obj) for r in rdfs_closure(_g(spark, rows)).collect()}
    assert not any(p == RDF_TYPE for _, p, _ in out)


def test_subclass_cycle_terminates(spark):
    rows = [
        ("urn:A", SUBCLASS, "urn:B", "uri", None, None),
        ("urn:B", SUBCLASS, "urn:A", "uri", None, None),
        ("urn:x", RDF_TYPE, "urn:A", "uri", None, None),
    ]
    out = {(r.subj, r.pred, r.obj) for r in rdfs_closure(_g(spark, rows)).collect()}
    assert ("urn:x", RDF_TYPE, "urn:B") in out
    # the closure excludes the degenerate self pair, so x a A is asserted
    # only once and no C ⊑ C rows appear
    assert ("urn:A", SUBCLASS, "urn:A") not in out


def test_set_semantics_no_duplicates(spark):
    df = rdfs_closure(_g(spark, BASE))
    assert df.count() == df.dropDuplicates(
        ["subj", "pred", "obj", "obj_kind", "lang", "dtype"]
    ).count()
