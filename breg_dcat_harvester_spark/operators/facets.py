"""Facet queries — the reference's five browser endpoints (SURVEY.md §2.3 J1-J5).

Each reference facet is a 2- or 3-pattern SPARQL BGP against the triple
store (browser.py:167-244); a BGP over a triple table is a self-join on the
shared variable.  Result semantics preserved: distinct terms of the object
column (browser.py:157 ``set(item[idx] ...)``), LIMIT 50 default
(browser.py:176,192,208,223,241) — with an ORDER BY added so the limited
subset is deterministic (Virtuoso's unordered LIMIT is not reproducible).

Scale notes: each side of the self-join is a predicate-filtered slice of
``edges``; with the edges table written partitioned by a pred-family column
(materialize.py), these filters prune files at scan time.  The rdf:type side
is usually the smaller; AQE picks broadcast when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import CLASS_URIS, DCAT, DCT, PRED_URIS, RDF_TYPE

FACET_LIMIT = 50  # browser.py:176 et al.


def _typed_subjects(edges: DataFrame, class_uri: str) -> DataFrame:
    # no .distinct(): ``edges`` is the merged graph, a SET of triples
    # (merge_triples), so (subj) is unique once pred AND obj are fixed —
    # a distinct here would be a pure wasted shuffle per facet.
    return edges.filter(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == class_uri)
    ).select("subj")


def _pred_pairs(edges: DataFrame, pred_uri: str) -> DataFrame:
    return edges.filter(F.col("pred") == pred_uri).select("subj", "obj")


def facet_terms(
    edges: DataFrame, class_uri: str, pred_uri: str, limit: int = FACET_LIMIT
) -> DataFrame:
    """J1-J4 shape: ?s rdf:type <class> . ?s <pred> ?o -> distinct ?o."""
    out = (
        _typed_subjects(edges, class_uri)
        .join(_pred_pairs(edges, pred_uri), "subj")
        .select(F.col("obj").alias("term"))
        .distinct()
        .orderBy("term")
    )
    return out.limit(limit) if limit else out


def catalog_taxonomies(edges: DataFrame, limit: int = FACET_LIMIT) -> DataFrame:
    """browser.py:167-179 (J1)."""
    return facet_terms(edges, CLASS_URIS["Catalog"], DCAT + "themeTaxonomy", limit)


def catalog_locations(edges: DataFrame, limit: int = FACET_LIMIT) -> DataFrame:
    """browser.py:182-195 (J2)."""
    return facet_terms(edges, CLASS_URIS["Catalog"], DCT + "spatial", limit)


def catalog_languages(edges: DataFrame, limit: int = FACET_LIMIT) -> DataFrame:
    """browser.py:198-211 (J3) — verbatim quirk predicate dct:LinguisticSystem."""
    return facet_terms(edges, CLASS_URIS["Catalog"], PRED_URIS["language"], limit)


def dataset_themes(edges: DataFrame, limit: int = FACET_LIMIT) -> DataFrame:
    """browser.py:214-226 (J4)."""
    return facet_terms(edges, CLASS_URIS["Dataset"], DCAT + "theme", limit)


def catalog_publisher_types(edges: DataFrame, limit: int = FACET_LIMIT) -> DataFrame:
    """browser.py:229-244 (J5): 3-hop chain catalog -> publisher -> dct:type."""
    catalogs = _typed_subjects(edges, CLASS_URIS["Catalog"])
    pub = _pred_pairs(edges, DCT + "publisher").withColumnRenamed("obj", "publisher")
    ptype = (
        _pred_pairs(edges, DCT + "type")
        .withColumnRenamed("subj", "publisher")
        .withColumnRenamed("obj", "term")
    )
    out = (
        catalogs.join(pub, "subj")
        .join(ptype, "publisher")
        .select("term")
        .distinct()
        .orderBy("term")
    )
    return out.limit(limit) if limit else out


def all_facets(edges: DataFrame, limit: int = FACET_LIMIT) -> DataFrame:
    """U3: the SPA's 5-facet fan-out (app/src/api.js:46-67) as one unioned
    DataFrame with a facet-key column."""
    parts = {
        "taxonomy": catalog_taxonomies(edges, limit),
        "location": catalog_locations(edges, limit),
        "language": catalog_languages(edges, limit),
        "theme": dataset_themes(edges, limit),
        "publisherType": catalog_publisher_types(edges, limit),
    }
    out = None
    for key, df in parts.items():
        part = df.select(F.lit(key).alias("facet"), "term")
        out = part if out is None else out.unionByName(part)
    return out
