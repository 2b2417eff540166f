"""RDF serialization surface — DataTypes enum, MIME map, N-Triples export.

Parity targets:
* ``DataTypes`` / ``DATA_TYPE_MIME`` / ``find_data_type`` mirror
  models.py:9-34 verbatim (enum values, MIME strings, ValueError texts).
* ``to_ntriples`` serializes an edges DataFrame to N-Triples lines using the
  canonical n3 forms (functions/terms.py) — the export stage standing in for
  the reference's store serialization (store.py writes SPARQL-update text).
* ``sniff_format`` reproduces the browser's try-each-format detection order
  ["xml", "turtle", "json-ld", "nt"] (browser.py:25,47-57) as a cheap
  first-bytes heuristic Column (S4) — used when ingesting raw RDF documents
  as text blobs rather than structured transcripts.
"""

from __future__ import annotations

import enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



class DataTypes(enum.Enum):
    """models.py:9-13 verbatim."""

    XML = "xml"
    TURTLE = "turtle"
    NT = "nt"
    JSON_LD = "json-ld"


# models.py:16-27 verbatim
DATA_TYPE_MIME = {
    DataTypes.XML: "application/rdf+xml",
    DataTypes.TURTLE: "text/turtle",
    DataTypes.NT: "application/n-triples",
    DataTypes.JSON_LD: "application/ld+json",
}

# browser.py:25 verbatim order
PARSE_TRY_FORMATS = ["xml", "turtle", "json-ld", "nt"]


def find_data_type(val: str) -> DataTypes:
    """models.py:30-34 (_find_enum) semantics: value -> member or ValueError."""
    for member in DataTypes:
        if member.value == val:
            return member
    raise ValueError(f"Unknown data type: {val}")


def mime_for(dtype: DataTypes) -> str:
    try:
        return DATA_TYPE_MIME[dtype]
    except KeyError as exc:  # models.py raises on unknown
        raise ValueError(f"Unknown MIME for data type: {dtype}") from exc


def sniff_format(doc: Column) -> Column:
    """First-bytes format heuristic in PARSE_TRY_FORMATS priority order."""
    head = F.ltrim(doc)
    return (
        F.when(head.startswith("<?xml") | head.startswith("<rdf"), F.lit("xml"))
        .when(head.startswith("@prefix") | head.startswith("@base"), F.lit("turtle"))
        .when(head.startswith("{") | head.startswith("["), F.lit("json-ld"))
        .when(head.rlike(r"^<[^>]+>\s*<[^>]+>"), F.lit("nt"))
        .otherwise(F.lit(None).cast("string"))
    )


def to_ntriples(edges: DataFrame) -> DataFrame:
    """One N-Triples line per edge row: '<s> <p> <o_or_literal> .'

    Delegates to the canonical serializer (operators/export.py — single
    source of the line format and the literal escape chain).
    """
    from ..operators.export import serialize_ntriples

    return serialize_ntriples(edges).withColumnRenamed("line", "ntriple")


def write_ntriples(edges: DataFrame, path: str) -> None:
    """Export the graph as N-Triples text files (one part per partition)."""
    from ..operators.export import write_ntriples as _write

    _write(edges, path)


def parse_ntriples(spark_df: DataFrame, col: str = "value") -> DataFrame:
    """Inverse of to_ntriples for round-trip tests: N-Triples line -> edge.

    (The production-grade parser is rdf_parse.parse_ntriples_doc; this is
    the Column-expression quick inverse, ECHAR-unescaped via
    terms.unescape_nt_literal.)
    """
    from ..functions.terms import unescape_nt_literal

    line = F.col(col)
    uri_obj = F.regexp_extract(line, r"^<[^>]+> <[^>]+> <([^>]+)> \.$", 1)
    lit_obj = unescape_nt_literal(
        F.regexp_extract(line, r'^<[^>]+> <[^>]+> "(.*)"[^"]*\.$', 1)
    )
    lang = F.regexp_extract(line, r'"@(\w+) \.$', 1)
    dtype = F.regexp_extract(line, r'"\^\^<([^>]+)> \.$', 1)
    return spark_df.select(
        F.regexp_extract(line, r"^<([^>]+)>", 1).alias("subj"),
        F.regexp_extract(line, r"^<[^>]+> <([^>]+)>", 1).alias("pred"),
        F.when(uri_obj != "", uri_obj).otherwise(lit_obj).alias("obj"),
        F.when(uri_obj != "", F.lit("uri")).otherwise(F.lit("literal")).alias("obj_kind"),
        F.when(lang != "", lang).otherwise(F.lit(None).cast("string")).alias("lang"),
        # engine convention: every literal carries xsd:string unless an
        # explicit ^^<dtype> is present (lang literals included — the @lang
        # N3 form omits the datatype, so restore it on parse)
        F.when(dtype != "", dtype)
        .when(uri_obj == "", F.lit("http://www.w3.org/2001/XMLSchema#string"))
        .otherwise(F.lit(None).cast("string"))
        .alias("dtype"),
    )
