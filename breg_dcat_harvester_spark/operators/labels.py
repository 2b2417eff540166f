"""Term label enrichment — the browser's Redis graph cache as a table
(SURVEY.md §2.1 S9-S11, §2.3 J9, §2.5 W4).

The reference dereferences each facet term over HTTP, caches the term's
graph in Redis (browser.py:62-78), negative-caches failures
(browser.py:81-91), and resolves ``preferredLabel(lang="en")`` taking the
first match (browser.py:140-142).  Per-row HTTP cannot exist at 10^12 scale;
the cache *is* a table here:

* ``build_labels_table``  — materialized (term, label, lang, label_prop)
  from the graph's own label-bearing predicates; at scale this table is
  refreshed incrementally and reused across every facet/search job.
* ``enrich_terms``        — broadcast left join replacing per-term GET (S10),
  after an anti-join against ``failed_terms`` (S11/U2).
* ``term_dicts``          — the {n3, cls, label, label_prop} response shape
  (browser.py:126-149).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.terms import to_n3
from ..schema import DCT, FOAF, SKOS

# preferredLabel's candidate properties (rdflib default order: skos:prefLabel,
# rdfs:label; we extend with the corpus's label-bearing predicates)
LABEL_PREDS = [
    SKOS + "prefLabel",
    "http://www.w3.org/2000/01/rdf-schema#label",
    FOAF + "name",
    DCT + "title",
]


def build_labels_table(edges: DataFrame, lang: str = "en") -> DataFrame:
    """(term, label, lang, label_prop): first preferred label per URI term.

    Preference: label-predicate priority order, then requested language
    first (browser.py:140-142 takes labels[0] for lang='en'), then
    lexicographic label for determinism (W4 row_number()==1).
    """
    pred_priority = F.array_position(
        F.array(*[F.lit(p) for p in LABEL_PREDS]), F.col("pred")
    )
    cands = (
        edges.filter(F.col("pred").isin(LABEL_PREDS) & (F.col("obj_kind") == "literal"))
        .select(
            F.col("subj").alias("term"),
            F.col("obj").alias("label"),
            F.col("lang"),
            F.col("pred").alias("label_prop"),
            pred_priority.alias("_prio"),
            F.when(F.col("lang") == lang, 0).otherwise(1).alias("_lang_rank"),
        )
    )
    w = Window.partitionBy("term").orderBy("_prio", "_lang_rank", "label")
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio", "_lang_rank")
    )


def build_labels_from_documents(
    docs: DataFrame, lang: str = "en", id_col: str = "source"
) -> DataFrame:
    """S3 end-to-end: labels table from a batch of fetched TERM DOCUMENTS.

    The reference dereferences each term URI over HTTP, parses the response
    into a per-term graph (browser.py:94-111 ``fetch_remote_graph``) and asks
    that graph for ``preferredLabel(term, lang="en")`` (browser.py:140-142).
    At 10^12 terms the fetch layer is a bulk crawl landing documents in
    object storage; this operator is everything after it: distributed
    format-sniffed parse (sources/rdf_parse.py, the same path as S2) then the
    first-preferred-label window.  Terms whose document is missing from
    ``docs`` simply have no row — ``enrich_terms``'s left join yields null,
    the analog of the reference's negative cache (browser.py:81-91).

    ``docs`` is ``read_rdf_documents`` output: (id_col, content, format?).
    """
    from ..sources.rdf_parse import parse_rdf_docs

    edges = parse_rdf_docs(docs, id_col=id_col)
    return build_labels_table(edges, lang=lang)


def enrich_terms(
    terms: DataFrame,
    labels: DataFrame,
    failed_terms: DataFrame | None = None,
    term_col: str = "term",
) -> DataFrame:
    """Left-join labels onto a term list; skip negative-cached terms (S11)."""
    t = terms
    if failed_terms is not None:
        t = t.join(
            failed_terms.select(F.col(failed_terms.columns[0]).alias(term_col)).distinct(),
            term_col,
            "left_anti",
        )
    lbl = F.broadcast(labels.withColumnRenamed("term", term_col))
    return t.join(lbl, term_col, "left")


def term_dicts(enriched: DataFrame, term_col: str = "term") -> DataFrame:
    """browser.py:126-130 response shape: n3 + rdflib class name + label."""
    is_uri = F.col(term_col).startswith("http") | F.col(term_col).startswith("urn:")
    kind = F.when(is_uri, F.lit("uri")).otherwise(F.lit("literal"))
    return enriched.select(
        to_n3(F.col(term_col), kind, F.lit(None).cast("string"), F.lit(None).cast("string")).alias("n3"),
        F.when(is_uri, F.lit("URIRef")).otherwise(F.lit("Literal")).alias("cls"),
        F.col("label"),
        F.col("label_prop"),
    )
