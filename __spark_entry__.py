"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship harvest (extract -> merge) on the
deterministic sf0.001 transcript corpus.  ``queries()`` exposes one entry per
implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet (the KG queries read the generated
transcript table via read_parquet; the relational/training-data queries use
the driver's pre-registered views).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.datagen import LANGUAGES, THEMES, ensure_transcripts
from breg_dcat_harvester_spark.functions import oracle_sql as osql
from breg_dcat_harvester_spark.operators import facets as fac
from breg_dcat_harvester_spark.operators import search as srch
from breg_dcat_harvester_spark.operators import cc as ccm
from breg_dcat_harvester_spark.operators import link as lnk
from breg_dcat_harvester_spark.operators.extract import extract_edges
from breg_dcat_harvester_spark.operators.merge import merge_triples
from breg_dcat_harvester_spark.operators.validate import (
    DEFAULT_SHAPES,
    validation_report,
)
from breg_dcat_harvester_spark.schema import (
    CLASS_URIS,
    DCAT,
    DCT,
    FOAF,
    PRED_URIS,
    RDF_TYPE,
)

# --- helpers -----------------------------------------------------------------

SEARCH_FILTERS = {"theme": [THEMES[0], THEMES[1]], "language": [LANGUAGES[0]]}


def _sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "sf0.01"


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(ensure_transcripts(_sf_name(sf_dir)))


def _merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_triples(extract_edges(_transcripts(spark, sf_dir), impl="sql"))


def _oracle_glob() -> str:
    return ensure_transcripts("sf0.01") + "/*.parquet"


# --- driver contract ---------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: harvest the sf0.001 transcripts via the pandas/Arrow path
    (north-star mandated) and return the merged distinct-triple graph."""
    t = spark.read.parquet(ensure_transcripts("sf0.001"))
    return merge_triples(extract_edges(t, impl="pandas"))


# each entry: name -> callable(spark, sf_dir) -> DataFrame
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # S2/F11/U1: the core harvest — distinct triple set of the merged graph
    q["kg_harvest_triples"] = lambda spark, sf: _merged(spark, sf).select(
        "subj", "pred", "obj", "obj_kind", "lang", "dtype"
    )

    # A1: the reference's one job metric (harvest.py:58)
    q["kg_num_triples"] = lambda spark, sf: _merged(spark, sf).select(
        "subj", "pred", "obj"
    ).agg(F.count(F.lit(1)).alias("num_triples"))

    # A8/P2: SHACL cardinality violations
    def _violations(spark, sf):
        rep = validation_report(_merged(spark, sf))
        return rep.select(
            "subj",
            "entity_type",
            "path",
            F.col("count").cast("long").alias("n_actual"),
            F.col("min_count").cast("long").alias("n_min"),
            F.coalesce(F.col("max_count").cast("long"), F.lit(-1)).alias("n_max"),
            "severity",
        )

    q["kg_validation_violations"] = _violations

    # J1-J5/A3/W1: the five facet endpoints
    q["kg_facet_taxonomy"] = lambda spark, sf: fac.catalog_taxonomies(_merged(spark, sf))
    q["kg_facet_location"] = lambda spark, sf: fac.catalog_locations(_merged(spark, sf))
    q["kg_facet_language"] = lambda spark, sf: fac.catalog_languages(_merged(spark, sf))
    q["kg_facet_theme"] = lambda spark, sf: fac.dataset_themes(_merged(spark, sf))
    q["kg_facet_publisher_type"] = lambda spark, sf: fac.catalog_publisher_types(
        _merged(spark, sf)
    )

    # J6/P6/A4: faceted search stage 1
    q["kg_search_datasets"] = lambda spark, sf: srch.search_datasets(
        _merged(spark, sf), SEARCH_FILTERS, limit=0
    )

    # J7/J8/A5/A6: detail stage over the search result
    def _detail(spark, sf):
        merged = _merged(spark, sf)
        found = srch.search_datasets(merged, SEARCH_FILTERS, limit=0)
        return srch.dataset_details_flat(merged, found)

    q["kg_dataset_detail"] = _detail

    # J10/F12: MinHash-LSH blocking + exact jaccard verify (brute-force oracle)
    q["kg_link_candidates"] = lambda spark, sf: lnk.link_pairs(
        _merged(spark, sf), threshold=0.8, scorer="sql"
    )

    # J11: connected-components canonical mapping over the link graph
    def _cc(spark, sf):
        pairs = lnk.link_pairs(_merged(spark, sf), threshold=0.8)
        return ccm.connected_components(pairs)

    q["kg_connected_components"] = _cc

    return q


def _facet_sql(glob: str, class_uri: str, pred_uri: str) -> str:
    return f"""
WITH edges AS (SELECT DISTINCT subj, pred, obj FROM {osql.edges_sql(glob)} AS _e)
SELECT DISTINCT p.obj AS term
FROM edges t JOIN edges p ON t.subj = p.subj
WHERE t.pred = '{RDF_TYPE}' AND t.obj = '{class_uri}' AND p.pred = '{pred_uri}'
ORDER BY term LIMIT 50
"""


def _search_core_sql(glob: str) -> str:
    """Shared star-join CTEs for the search/detail oracles."""
    theme_in = ", ".join(f"'{t}'" for t in SEARCH_FILTERS["theme"])
    lang_in = ", ".join(f"'{l}'" for l in SEARCH_FILTERS["language"])
    return f"""
WITH edges AS (SELECT DISTINCT subj, pred, obj FROM {osql.edges_sql(glob)} AS _e),
star AS (
    SELECT ct.subj AS catalog, cd.obj AS dataset
    FROM edges ct
    JOIN edges cd ON cd.subj = ct.subj AND cd.pred = '{DCAT}dataset'
    JOIN edges dt ON dt.subj = cd.obj AND dt.pred = '{RDF_TYPE}' AND dt.obj = '{CLASS_URIS["Dataset"]}'
    JOIN edges tax ON tax.subj = ct.subj AND tax.pred = '{DCAT}themeTaxonomy'
    JOIN edges lng ON lng.subj = ct.subj AND lng.pred = '{PRED_URIS["language"]}'
    JOIN edges thm ON thm.subj = cd.obj AND thm.pred = '{DCAT}theme'
    JOIN edges pub ON pub.subj = ct.subj AND pub.pred = '{DCT}publisher'
    JOIN edges pt ON pt.subj = pub.obj AND pt.pred = '{DCT}type'
    JOIN edges loc ON loc.subj = ct.subj AND loc.pred = '{DCT}spatial'
    WHERE ct.pred = '{RDF_TYPE}' AND ct.obj = '{CLASS_URIS["Catalog"]}'
      AND thm.obj IN ({theme_in}) AND lng.obj IN ({lang_in})
),
found AS (SELECT DISTINCT dataset FROM star)
"""


def oracle_sql() -> dict[str, str]:
    glob = _oracle_glob()
    sql: dict[str, str] = {}

    sql["kg_harvest_triples"] = (
        f"SELECT subj, pred, obj, obj_kind, lang, dtype FROM {osql.triples_sql(glob)} AS t"
    )
    sql["kg_num_triples"] = (
        f"SELECT count(*) AS num_triples FROM "
        f"(SELECT DISTINCT subj, pred, obj FROM {osql.edges_sql(glob)} AS _e) AS t"
    )

    shapes_rows = ", ".join(
        "('{}', '{}', {}, {}, '{}')".format(
            s.target_class, s.path, s.min_count,
            s.max_count if s.max_count is not None else "NULL", s.severity,
        )
        for s in DEFAULT_SHAPES
    )
    sql["kg_validation_violations"] = f"""
WITH edges AS (SELECT DISTINCT subj, pred, obj FROM {osql.edges_sql(glob)} AS _e),
typed AS (SELECT DISTINCT subj, obj AS entity_type FROM edges WHERE pred = '{RDF_TYPE}'),
counts AS (
    SELECT subj, pred, count(DISTINCT obj) AS cnt FROM edges
    WHERE pred <> '{RDF_TYPE}' GROUP BY subj, pred
),
shapes(target_class, path, min_count, max_count, severity) AS (VALUES {shapes_rows})
SELECT t.subj, t.entity_type, s.path,
       CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_actual,
       CAST(s.min_count AS BIGINT) AS n_min,
       CAST(coalesce(s.max_count, -1) AS BIGINT) AS n_max,
       s.severity
FROM typed t
JOIN shapes s ON t.entity_type = s.target_class
LEFT JOIN counts c ON c.subj = t.subj AND c.pred = s.path
WHERE coalesce(c.cnt, 0) < s.min_count
   OR (s.max_count IS NOT NULL AND coalesce(c.cnt, 0) > s.max_count)
"""

    sql["kg_facet_taxonomy"] = _facet_sql(glob, CLASS_URIS["Catalog"], DCAT + "themeTaxonomy")
    sql["kg_facet_location"] = _facet_sql(glob, CLASS_URIS["Catalog"], DCT + "spatial")
    sql["kg_facet_language"] = _facet_sql(glob, CLASS_URIS["Catalog"], PRED_URIS["language"])
    sql["kg_facet_theme"] = _facet_sql(glob, CLASS_URIS["Dataset"], DCAT + "theme")
    sql["kg_facet_publisher_type"] = f"""
WITH edges AS (SELECT DISTINCT subj, pred, obj FROM {osql.edges_sql(glob)} AS _e)
SELECT DISTINCT pt.obj AS term
FROM edges t
JOIN edges pub ON pub.subj = t.subj AND pub.pred = '{DCT}publisher'
JOIN edges pt ON pt.subj = pub.obj AND pt.pred = '{DCT}type'
WHERE t.pred = '{RDF_TYPE}' AND t.obj = '{CLASS_URIS["Catalog"]}'
ORDER BY term LIMIT 50
"""

    sql["kg_search_datasets"] = _search_core_sql(glob) + "SELECT dataset FROM found"

    sql["kg_dataset_detail"] = _search_core_sql(glob) + f"""
, rows_ AS (
    SELECT f.dataset, cd.subj AS catalog,
           d.obj AS description, i.obj AS identifier, ti.obj AS title,
           di.obj AS distribution, du.obj AS dist_url, dm.obj AS dist_type,
           sp.obj AS location, th.obj AS theme, lg.obj AS language,
           dd.obj AS dist_description
    FROM found f
    JOIN edges cd ON cd.obj = f.dataset AND cd.pred = '{DCAT}dataset'
    JOIN edges ctt ON ctt.subj = cd.subj AND ctt.pred = '{RDF_TYPE}' AND ctt.obj = '{CLASS_URIS["Catalog"]}'
    JOIN edges d ON d.subj = f.dataset AND d.pred = '{DCT}description'
    JOIN edges i ON i.subj = f.dataset AND i.pred = '{DCT}identifier'
    JOIN edges ti ON ti.subj = f.dataset AND ti.pred = '{DCT}title'
    JOIN edges di ON di.subj = f.dataset AND di.pred = '{DCAT}distribution'
    JOIN edges du ON du.subj = di.obj AND du.pred = '{DCAT}accessURL'
    JOIN edges dm ON dm.subj = di.obj AND dm.pred = '{DCAT}mediaType'
    JOIN edges sp ON sp.subj = f.dataset AND sp.pred = '{DCT}spatial'
    JOIN edges th ON th.subj = f.dataset AND th.pred = '{DCAT}theme'
    JOIN edges lg ON lg.subj = cd.subj AND lg.pred = '{PRED_URIS["language"]}'
    LEFT JOIN edges dd ON dd.subj = di.obj AND dd.pred = '{DCT}description'
)
SELECT dataset, distribution,
       min(catalog) AS catalog,
       string_agg(DISTINCT description, '|' ORDER BY description) AS descriptions,
       string_agg(DISTINCT identifier, '|' ORDER BY identifier) AS identifiers,
       string_agg(DISTINCT title, '|' ORDER BY title) AS titles,
       string_agg(DISTINCT location, '|' ORDER BY location) AS locations,
       string_agg(DISTINCT theme, '|' ORDER BY theme) AS themes,
       string_agg(DISTINCT language, '|' ORDER BY language) AS languages,
       min(dist_url) AS dist_url,
       min(dist_type) AS dist_type,
       coalesce(string_agg(DISTINCT dist_description, '|' ORDER BY dist_description), '')
           AS dist_descriptions
FROM rows_
GROUP BY dataset, distribution
ORDER BY dataset, distribution
"""

    # brute-force exact-jaccard pairs (the LSH path must equal this w.h.p.:
    # P(miss) = (1-j^2)^24 ~ 2e-11 at j=0.8)
    link_core = f"""
WITH edges AS (SELECT DISTINCT subj, pred, obj FROM {osql.edges_sql(glob)} AS _e),
labeled AS (
    SELECT t.subj AS node_id, t.entity_type, l.label
    FROM (SELECT subj, min(obj) AS entity_type FROM edges
          WHERE pred = '{RDF_TYPE}' GROUP BY subj) t
    JOIN (SELECT subj, min(obj) AS label FROM edges
          WHERE pred IN ('{FOAF}name', '{DCT}title') GROUP BY subj) l
      ON l.subj = t.subj
),
grams AS (
    SELECT DISTINCT node_id, entity_type,
           unnest(list_transform(
               generate_series(1, greatest(length(label) - 2, 1)),
               i -> substr(lower(label), CAST(i AS INTEGER), 3))) AS gram
    FROM labeled
),
pair_inter AS (
    SELECT g1.entity_type, g1.node_id AS a, g2.node_id AS b,
           count(*) AS g_inter
    FROM grams g1
    JOIN grams g2 ON g2.gram = g1.gram AND g2.entity_type = g1.entity_type
                 AND g1.node_id < g2.node_id
    GROUP BY 1, 2, 3
),
sizes AS (SELECT node_id, count(*) AS n FROM grams GROUP BY 1),
linked AS (
    SELECT p.entity_type, p.a, p.b,
           CAST(p.g_inter AS BIGINT) AS g_inter,
           CAST(sa.n + sb.n - p.g_inter AS BIGINT) AS g_union
    FROM pair_inter p
    JOIN sizes sa ON sa.node_id = p.a
    JOIN sizes sb ON sb.node_id = p.b
    WHERE p.g_inter * 1000 >= (sa.n + sb.n - p.g_inter) * 800
)
"""
    sql["kg_link_candidates"] = (
        link_core + "SELECT entity_type, a, b, g_inter, g_union FROM linked"
    )

    sql["kg_connected_components"] = link_core + """
, sym AS (
    SELECT a AS x, b AS y FROM linked
    UNION
    SELECT b AS x, a AS y FROM linked
),
walk(x, c) AS (
    SELECT x, x FROM (SELECT DISTINCT x FROM sym) AS n
    UNION
    SELECT s.y, w.c FROM walk w JOIN sym s ON s.x = w.x
)
SELECT x AS node_id, min(c) AS canonical_id FROM walk GROUP BY x
"""
    sql["kg_connected_components"] = (
        sql["kg_connected_components"].replace("WITH edges AS", "WITH RECURSIVE edges AS")
    )
    return sql
