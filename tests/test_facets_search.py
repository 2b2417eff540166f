"""Facets, labels, and faceted search on the golden + small fixtures."""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.datagen import LANGUAGES, THEMES
from breg_dcat_harvester_spark.operators import facets as fac
from breg_dcat_harvester_spark.operators import labels as lbl
from breg_dcat_harvester_spark.operators import search as srch
from breg_dcat_harvester_spark.operators.extract import extract_edges
from breg_dcat_harvester_spark.operators.merge import merge_triples
from breg_dcat_harvester_spark.schema import BREG_NS


@pytest.fixture(scope="module")
def golden_edges(golden_df):
    return merge_triples(extract_edges(golden_df, emit_provenance=False)).cache()


@pytest.fixture(scope="module")
def merged(small_transcripts):
    return merge_triples(extract_edges(small_transcripts)).cache()


def test_golden_taxonomy_facet(spark, golden_edges):
    got = {r.term for r in fac.catalog_taxonomies(golden_edges).collect()}
    assert got == {
        BREG_NS + "sample-scheme",
        BREG_NS + "another-scheme",
        BREG_NS + "third-scheme",
    }


def test_facet_limit_is_50(spark, merged):
    """W1: reference facet queries LIMIT 50 (browser.py:176)."""
    assert fac.dataset_themes(merged).count() <= 50
    assert fac.catalog_locations(merged, limit=2).count() == 2


def test_all_facets_union(spark, golden_edges):
    out = fac.all_facets(golden_edges)
    by_facet = {
        r.facet: r.cnt
        for r in out.groupBy("facet").agg(F.count("*").alias("cnt")).collect()
    }
    # golden fixture has taxonomies but no locations/languages/themes/ptypes
    assert by_facet.get("taxonomy") == 3
    assert "location" not in by_facet


def test_labels_preferred_en_first_match(spark, merged):
    """W4/P9: first preferred label, lang='en' preferred."""
    labels = lbl.build_labels_table(merged)
    one = labels.filter(F.col("term").contains("agent-0000")).head()
    assert one is not None and one.lang == "en"
    assert one.label_prop.endswith("name")
    # exactly one label row per term
    assert labels.groupBy("term").count().filter("count > 1").count() == 0


def test_negative_cache_anti_join(spark, merged):
    """S11/U2: failed terms are skipped before enrichment."""
    labels = lbl.build_labels_table(merged)
    terms = fac.catalog_publisher_types(merged, limit=0).select(
        F.col("term")
    )
    failed = terms.limit(1)
    enriched = lbl.enrich_terms(terms, labels, failed_terms=failed)
    assert enriched.count() == terms.count() - 1


def test_search_filters_and_semantics(spark, merged):
    all_ds = srch.search_datasets(merged, {}, limit=0)
    filtered = srch.search_datasets(
        merged, {"theme": [THEMES[0]], "language": [LANGUAGES[0]]}, limit=0
    )
    assert 0 < filtered.count() <= all_ds.count()
    # unknown filter keys are whitelisted away (P7) — same result
    w = srch.search_datasets(merged, {"bogus": ["x"], "theme": [THEMES[0]], "language": [LANGUAGES[0]]}, limit=0)
    assert w.count() == filtered.count()
    # catalog filter restricts to that catalog's datasets
    one_cat = merged.sparkSession.createDataFrame(
        [(BREG_NS + "catalog-00000",)], "catalog string"
    )
    got = srch.search_datasets(merged, {"catalog": [BREG_NS + "catalog-00000"]}, limit=0)
    assert got.count() <= 2  # each catalog links exactly 2 datasets


def test_detail_optional_distribution_description(spark, merged):
    """J7: odd distributions lack dct:description -> left-outer null path
    (browser.py:293,319-322); lists are deduped (A6)."""
    found = srch.search_datasets(merged, {}, limit=0)
    flat = srch.dataset_details_flat(merged, found).cache()
    assert flat.count() > 0
    # every odd dist index has empty dist_descriptions, even has one
    some_empty = flat.filter(F.col("dist_descriptions") == "").count()
    some_full = flat.filter(F.col("dist_descriptions") != "").count()
    assert some_empty > 0 and some_full > 0
    nested = srch.dataset_details_nested(merged, found)
    row = nested.head()
    assert isinstance(row.distribution, dict) and len(row.distribution) >= 1


def test_labels_from_term_documents(spark):
    """S3 dereference analog end-to-end: Turtle term documents -> distributed
    parse -> preferredLabel window; golden = the fixture's pure-Python
    preferredLabel replay (fixtures._preferred_label over the same tuples)."""
    import glob
    import os

    from breg_dcat_harvester_spark import fixtures as fx
    from breg_dcat_harvester_spark.sources import rdf_parse as rdfp

    docs_dir, _ = fx.ensure_term_docs()
    paths = sorted(glob.glob(os.path.join(docs_dir, "*.ttl")))[:40]
    docs = rdfp.read_rdf_documents(spark, paths)
    got = {
        r["term"]: (r["label"], r["label_prop"])
        for r in lbl.build_labels_from_documents(docs).collect()
    }
    checked = 0
    for i in range(60):
        term = f"{BREG_NS}agent-{i:04d}"
        if i % 4 == 3:
            assert term not in got  # no document -> no label row
            continue
        if term not in got:
            continue  # beyond the 40-doc slice
        assert got[term] == fx._preferred_label(fx._term_doc_labels(i)), i
        checked += 1
    assert checked >= 25
    # the scheme node's label must not leak onto any agent term, but IS
    # resolvable for the scheme URI itself
    assert got.get(f"{BREG_NS}agent-scheme", (None,))[0] == "agent scheme"
