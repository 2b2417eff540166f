"""Two-stage faceted dataset search (SURVEY.md §3.2; browser.py:337-405).

Stage 1 — the 9-pattern star+chain BGP (browser.py:358-371) as a multi-way
equi-join of predicate-filtered edge slices, with conjunctive ``?k IN (...)``
facet filters (browser.py:350-356 -> Column.isin / P6), yielding distinct
dataset URIs (browser.py:400 / A4).

Stage 2 — the 12-var detail query (browser.py:262-296) restricted to stage-1
URIs (semi-join, J8), including the OPTIONAL distribution description as a
left outer join (J7), then the nested per-dataset aggregation with list
dedup (browser.py:300-334 / A5-A6) via collect_set + map_from_entries.

Scale notes: stage 1 is a chain of equi-joins all keyed on entity URIs; the
type slices are small relative to the full edge table and AQE broadcasts
them.  The two-stage shape itself is the reference's own optimization
(limit the star first, detail-join only survivors) and caps stage-2 input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import CLASS_URIS, DCAT, DCT, PRED_URIS, RDF_TYPE

SEARCH_LIMIT_DEFAULT = 200  # browser.py:340; the SPA sends 50 (app/src/api.js:71)

# FilterKeys enum parity (browser.py:247-255)
FILTER_KEYS = (
    "catalog",
    "dataset",
    "themeTaxonomy",
    "language",
    "theme",
    "publisher",
    "publisherType",
    "location",
)


# Precondition for both slicers: ``edges`` is the merged graph — a SET of
# (subj,pred,obj) triples (merge_triples output).  A pred-fixed slice of a
# triple set is already distinct on (subj,obj), and a (pred,obj)-fixed slice
# on subj, so no .distinct() (it would add one wasted shuffle per pattern —
# the 9-pattern star would pay nine).

def _slice(edges: DataFrame, pred_uri: str, subj_as: str, obj_as: str) -> DataFrame:
    return edges.filter(F.col("pred") == pred_uri).select(
        F.col("subj").alias(subj_as), F.col("obj").alias(obj_as)
    )


def _typed(edges: DataFrame, class_uri: str, as_col: str) -> DataFrame:
    return edges.filter(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == class_uri)
    ).select(F.col("subj").alias(as_col))


def search_star(edges: DataFrame) -> DataFrame:
    """The 9-pattern star as a DataFrame (one row per variable binding)."""
    catalog = _typed(edges, CLASS_URIS["Catalog"], "catalog")
    dataset_t = _typed(edges, CLASS_URIS["Dataset"], "dataset")
    cat_ds = _slice(edges, DCAT + "dataset", "catalog", "dataset")
    cat_tax = _slice(edges, DCAT + "themeTaxonomy", "catalog", "themeTaxonomy")
    cat_lang = _slice(edges, PRED_URIS["language"], "catalog", "language")
    ds_theme = _slice(edges, DCAT + "theme", "dataset", "theme")
    cat_pub = _slice(edges, DCT + "publisher", "catalog", "publisher")
    pub_type = _slice(edges, DCT + "type", "publisher", "publisherType")
    cat_loc = _slice(edges, DCT + "spatial", "catalog", "location")

    return (
        catalog.join(cat_ds, "catalog")
        .join(dataset_t, "dataset")
        .join(cat_tax, "catalog")
        .join(cat_lang, "catalog")
        .join(ds_theme, "dataset")
        .join(cat_pub, "catalog")
        .join(pub_type, "publisher")
        .join(cat_loc, "catalog")
        .select(*FILTER_KEYS)
    )


def search_datasets(
    edges: DataFrame,
    filters: dict[str, list[str]] | None = None,
    limit: int = SEARCH_LIMIT_DEFAULT,
) -> DataFrame:
    """Stage 1: distinct dataset URIs matching the facet filters.

    ``filters`` maps FilterKeys values to URI lists; unknown keys are dropped
    (whitelist projection, browser.py:345-348 / P7).  The LIMIT is applied to
    deterministically ordered star rows (the reference's unordered SPARQL
    LIMIT is not reproducible).
    """
    star = search_star(edges)
    for key, values in (filters or {}).items():
        if key in FILTER_KEYS and values:
            star = star.filter(F.col(key).isin(values))
    if limit:
        # determinism sort on the projected key only: the limit prefix of
        # rows ordered by ``dataset`` has a deterministic dataset multiset
        # even across ties, so the distinct set below is stable — ordering
        # all 8 star columns (the former form) paid a wider sort for nothing.
        # orderBy+limit compiles to TakeOrdered (no full sort shuffle).
        star = star.orderBy("dataset").limit(limit)
    return star.select("dataset").distinct()


def dataset_details_flat(edges: DataFrame, dataset_uris: DataFrame) -> DataFrame:
    """Stage 2, flat form: one row per (dataset, distribution) with sorted
    deduped list fields aggregated to strings — the oracle-comparable shape.

    Join graph = browser.py:262-296: inner patterns for catalog/description/
    identifier/title/distribution/accessURL/mediaType/spatial/theme/language,
    left outer for the OPTIONAL distribution description (browser.py:293).
    """
    ds = dataset_uris.select(F.col(dataset_uris.columns[0]).alias("dataset"))
    cat_ds = _slice(edges, DCAT + "dataset", "catalog", "dataset")
    catalog_t = _typed(edges, CLASS_URIS["Catalog"], "catalog")
    dataset_t = _typed(edges, CLASS_URIS["Dataset"], "dataset")
    descr = _slice(edges, DCT + "description", "dataset", "description")
    ident = _slice(edges, DCT + "identifier", "dataset", "identifier")
    title = _slice(edges, DCT + "title", "dataset", "title")
    distr = _slice(edges, DCAT + "distribution", "dataset", "distribution")
    durl = _slice(edges, DCAT + "accessURL", "distribution", "dist_url")
    dtype_ = _slice(edges, DCAT + "mediaType", "distribution", "dist_type")
    spatial = _slice(edges, DCT + "spatial", "dataset", "location")
    theme = _slice(edges, DCAT + "theme", "dataset", "theme")
    lang = _slice(edges, PRED_URIS["language"], "catalog", "language")
    ddescr = _slice(edges, DCT + "description", "distribution", "dist_description")

    rows = (
        ds.join(dataset_t, "dataset")  # left_semi-like restriction (J8)
        .join(cat_ds, "dataset")
        .join(catalog_t, "catalog")
        .join(descr, "dataset")
        .join(ident, "dataset")
        .join(title, "dataset")
        .join(distr, "dataset")
        .join(durl, "distribution")
        .join(dtype_, "distribution")
        .join(spatial, "dataset")
        .join(theme, "dataset")
        .join(lang, "catalog")
        .join(ddescr, "distribution", "left")  # OPTIONAL (browser.py:293)
    )

    def agg_sorted(col):
        return F.array_join(F.array_sort(F.collect_set(col)), "|")

    return (
        rows.groupBy("dataset", "distribution")
        .agg(
            F.min("catalog").alias("catalog"),
            agg_sorted("description").alias("descriptions"),
            agg_sorted("identifier").alias("identifiers"),
            agg_sorted("title").alias("titles"),
            agg_sorted("location").alias("locations"),
            agg_sorted("theme").alias("themes"),
            agg_sorted("language").alias("languages"),
            F.min("dist_url").alias("dist_url"),
            F.min("dist_type").alias("dist_type"),
            agg_sorted("dist_description").alias("dist_descriptions"),
        )
        .orderBy("dataset", "distribution")
    )


def dataset_details_nested(edges: DataFrame, dataset_uris: DataFrame) -> DataFrame:
    """Stage 2, nested form mirroring the reference's response dicts
    (browser.py:300-334): per-dataset deduped lists + a distribution map
    {distr_uri -> {url, type, description[]}} via map_from_entries."""
    flat = dataset_details_flat(edges, dataset_uris)
    dist_entry = F.struct(
        F.col("distribution").alias("key"),
        F.struct(
            F.col("dist_url").alias("url"),
            F.col("dist_type").alias("type"),
            F.split("dist_descriptions", r"\|").alias("description"),
        ).alias("value"),
    )
    return flat.groupBy("dataset").agg(
        F.min("catalog").alias("catalog"),
        F.split(F.min("descriptions"), r"\|").alias("description"),
        F.split(F.min("identifiers"), r"\|").alias("identifier"),
        F.split(F.min("titles"), r"\|").alias("title"),
        F.split(F.min("locations"), r"\|").alias("location"),
        F.split(F.min("themes"), r"\|").alias("theme"),
        F.split(F.min("languages"), r"\|").alias("language"),
        F.map_from_entries(F.array_sort(F.collect_set(dist_entry))).alias("distribution"),
    )
