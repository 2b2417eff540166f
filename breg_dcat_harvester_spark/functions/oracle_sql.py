"""ANSI-SQL (DuckDB) mirror of the extraction grammar.

The driver's correctness gate runs each Spark query side-by-side with a
DuckDB oracle over the same parquet (CORRECTNESS_r{N}.json).  This module
builds the oracle's ``edges`` CTE from the *same* vocabulary dicts in
schema.py, so Spark and SQL can never drift apart silently.

Everything here must stay lexically identical in behaviour to
operators/extract.py: the block regex, the skolem recipe
(``sha256(conv_id || '|' || turn_idx || '|' || local)``), the uri/literal
detection, the en-tag rule, and the provenance folding.
"""

from __future__ import annotations

from ..schema import (
    BREG_NS,
    CLASS_URIS,
    PRED_URIS,
    PROV_ROLE,
    PROV_TOOL,
    RDF_TYPE,
    ROLE_NS,
    SKOLEM_NS,
    TOOL_NS,
    XSD,
)

XSD_STRING = XSD + "string"


def _case(expr: str, mapping: dict[str, str]) -> str:
    whens = "\n        ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items()
    )
    return f"CASE {expr}\n        {whens}\n        ELSE NULL END"


def edges_sql(parquet_glob: str, emit_provenance: bool = True) -> str:
    """A self-contained subquery producing the edges relation
    (subj, pred, obj, obj_kind, lang, dtype, conv_id, turn_idx)."""
    class_case = _case("tag", CLASS_URIS)
    pred_case = _case("key", PRED_URIS)

    prov = ""
    if emit_provenance:
        prov = f"""
    UNION ALL
    SELECT subj, '{PROV_ROLE}' AS pred, '{ROLE_NS}' || role AS obj,
           'uri' AS obj_kind, CAST(NULL AS VARCHAR) AS lang,
           CAST(NULL AS VARCHAR) AS dtype, conv_id, turn_idx
    FROM _sb WHERE role IS NOT NULL
    UNION ALL
    SELECT subj, '{PROV_TOOL}' AS pred, '{TOOL_NS}' || tool AS obj,
           'uri' AS obj_kind, CAST(NULL AS VARCHAR) AS lang,
           CAST(NULL AS VARCHAR) AS dtype, conv_id, turn_idx
    FROM _sb WHERE tool IS NOT NULL"""

    return f"""(
    WITH _b AS (
        SELECT conv_id, turn_idx, role, tool,
               unnest(regexp_extract_all(text, '\\[\\[([^\\[\\]]+)\\]\\]', 1)) AS block
        FROM read_parquet('{parquet_glob}')
    ),
    _bb AS (
        SELECT conv_id, turn_idx, role, tool, block,
               string_split(block, '|')[1] AS tag,
               regexp_extract(block, '(?:^|\\|)id=([^|]*)', 1) AS local
        FROM _b
    ),
    _sb AS (
        SELECT conv_id, turn_idx, role, tool, block,
               {class_case} AS class_uri,
               CASE WHEN starts_with(local, '_:')
                    THEN '{SKOLEM_NS}' || sha256(conv_id || '|' || CAST(turn_idx AS VARCHAR) || '|' || local)
                    ELSE '{BREG_NS}' || local END AS subj
        FROM _bb
        WHERE local <> ''
          AND ({class_case}) IS NOT NULL
    ),
    _kv AS (
        SELECT subj, conv_id, turn_idx,
               unnest(string_split(block, '|')[2:]) AS kv
        FROM _sb
    ),
    _kvp AS (
        SELECT subj, conv_id, turn_idx,
               regexp_extract(kv, '^([^=]*)=', 1) AS key,
               regexp_extract(kv, '^[^=]*=(.*)$', 1) AS value
        FROM _kv
    ),
    _kvk AS (
        SELECT subj, conv_id, turn_idx, key, value,
               {pred_case} AS pred,
               CASE WHEN starts_with(value, '#') OR starts_with(value, 'http://')
                      OR starts_with(value, 'https://') OR starts_with(value, 'urn:')
                    THEN 'uri' ELSE 'literal' END AS obj_kind
        FROM _kvp
        WHERE value <> '' AND ({pred_case}) IS NOT NULL
    )
    SELECT subj, '{RDF_TYPE}' AS pred, class_uri AS obj, 'uri' AS obj_kind,
           CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS VARCHAR) AS dtype,
           conv_id, turn_idx
    FROM _sb
    UNION ALL
    SELECT subj, pred,
           CASE WHEN starts_with(value, '#') THEN '{BREG_NS}' || substr(value, 2)
                ELSE value END AS obj,
           obj_kind,
           CASE WHEN obj_kind = 'literal' AND key IN ('title', 'description', 'name')
                THEN 'en' ELSE NULL END AS lang,
           CASE WHEN obj_kind = 'literal' THEN '{XSD_STRING}' ELSE NULL END AS dtype,
           conv_id, turn_idx
    FROM _kvk{prov}
)"""


def triples_sql(parquet_glob: str, emit_provenance: bool = True) -> str:
    """Distinct (subj, pred, obj) set — the merged named graph (U1)."""
    return f"""(
    SELECT DISTINCT subj, pred, obj, obj_kind, lang, dtype
    FROM {edges_sql(parquet_glob, emit_provenance)} AS _e
)"""
