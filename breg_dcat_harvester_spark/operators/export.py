"""Graph export & partition lineage — the sink side of the harvest.

The reference persists its merged graph by serializing every term to its N3
lexical form and POSTing SPARQL ``INSERT DATA`` statements at the store
(store.py:19-25 ``node.n3()`` / ``"<{}>".format(node.skolemize())`` via
rdflib's SPARQLUpdateStore).  At 100 TB there is no single store endpoint to
POST to — the equivalent operation is a distributed serialization of the
triple table to N-Triples lines (the line-oriented RDF syntax built for
exactly this: one triple per line, no document state, so any partition can
be written independently and files concatenate into a valid graph).

``serialize_ntriples`` is a pure map (zero shuffle, whole-stage codegen):
each (subj, pred, obj, obj_kind, lang, dtype) row becomes one canonical
N-Triples line.  Term formatting and RDF 1.1 STRING_LITERAL_QUOTE escaping
live in ONE place — ``functions.terms.to_n3`` — shared with every other
n3-producing operator; ``oracle_line_sql`` generates the DuckDB mirror
from the same ``terms.NT_ESCAPES`` table so engine and oracle cannot
silently diverge (the contract query asserts byte-identical lines).
``sources.rdf_io.to_ntriples`` delegates here.

``partition_lineage`` is the north-rule "per-partition lineage + metrics
rows" as a *content-keyed* table: edges roll up per salted conv_id bucket
(the same sha256 recipe as sampling/sharding — engine-replayable, skew-free
by construction), giving (bucket, n_edges, n_convs, n_subjects, turn span)
rows that are deterministic across cluster sizes and re-runs — unlike
physical partition ids, which depend on the scan split.  One hash-agg
shuffle on the bucket key; count-distincts expand map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.terms import NT_ESCAPES, subj_n3, to_n3
from ..schema import XSD
from .sampling import sample_bucket

XSD_STRING = XSD + "string"


def serialize_ntriples(triples: DataFrame) -> DataFrame:
    """One canonical N-Triples line per triple — ``line: string``.

    Map-only (no exchange): the writer can stream any partitioning straight
    to per-partition ``.nt`` part files, and concatenation is a valid graph
    document.  Subjects and predicates are URIs post-skolemization
    (store.py:19-25), so only the object takes the literal branch.
    """
    return triples.select(
        F.concat(
            subj_n3(F.col("subj")),
            F.lit(" "),
            subj_n3(F.col("pred")),
            F.lit(" "),
            to_n3(F.col("obj"), F.col("obj_kind"), F.col("lang"), F.col("dtype")),
            F.lit(" ."),
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Materialize the graph as partition-parallel ``.nt`` text files."""
    serialize_ntriples(triples).write.mode("overwrite").text(path)


def oracle_line_sql() -> str:
    """DuckDB expression producing the same line from (subj, pred, obj,
    obj_kind, lang, dtype) columns — escape chain generated from the SAME
    ``terms.NT_ESCAPES`` table the engine uses."""
    lex = "obj"
    for raw, esc in NT_ESCAPES:

        def chrs(s: str) -> str:
            return " || ".join(
                f"chr({ord(c)})" if c in ("\\", "\n", "\r") else f"'{c}'"
                for c in s
            )

        lex = f"replace({lex}, {chrs(raw)}, {chrs(esc)})"
    return f"""'<' || subj || '> <' || pred || '> ' ||
  CASE WHEN obj_kind = 'uri' THEN '<' || obj || '>'
       ELSE '"' || {lex} || '"' ||
            CASE WHEN lang IS NOT NULL THEN '@' || lang
                 WHEN dtype IS NOT NULL AND dtype <> '{XSD_STRING}'
                      THEN '^^<' || dtype || '>'
                 ELSE '' END
  END || ' .'"""


# ---------------------------------------------------------------------------
# Turtle export — the grouped, prefix-compacted RDF syntax


# Namespaces the harvester's vocabulary actually uses (schema.py); none is a
# prefix of another, so first-match compaction is order-independent.
TURTLE_PREFIXES: list[tuple[str, str]] = [
    ("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
    ("dct", "http://purl.org/dc/terms/"),
    ("dcat", "http://www.w3.org/ns/dcat#"),
    ("foaf", "http://xmlns.com/foaf/0.1/"),
    ("skos", "http://www.w3.org/2004/02/skos/core#"),
    ("xsd", XSD),
]

# conservative PN_LOCAL subset: compact only when the local name is plainly
# safe under both engines' regex dialects; anything else keeps <full-iri>
_PN_LOCAL_RE = "^[A-Za-z][A-Za-z0-9_-]*$"

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _compact_uri(uri: F.Column) -> F.Column:
    out = F.concat(F.lit("<"), uri, F.lit(">"))
    for pfx, ns in TURTLE_PREFIXES:
        local = F.substring(uri, len(ns) + 1, 1 << 24)
        ok = uri.startswith(ns) & local.rlike(_PN_LOCAL_RE)
        out = F.when(ok, F.concat(F.lit(pfx + ":"), local)).otherwise(out)
    return out


def turtle_header() -> str:
    """``@prefix`` directives for :data:`TURTLE_PREFIXES` — Turtle allows
    re-declaration anywhere, so per-partition headers concatenate into one
    valid document."""
    return "".join(
        f"@prefix {pfx}: <{ns}> .\n" for pfx, ns in TURTLE_PREFIXES
    ) + "\n"


def serialize_turtle(triples: DataFrame) -> DataFrame:
    """Grouped Turtle: one ``(subj, block)`` row per subject.

    The block is the subject's full predicate-object list — ``;``-separated
    predicate branches, ``,``-separated object lists, ``a`` for rdf:type,
    prefix-compacted URIs (datatype IRIs stay full: they're rare and the
    N3 ``^^<…>`` form is valid Turtle).  ONE subj hash-agg is the whole
    plan: terms render map-side, collect_list gathers the (bounded:
    triples-per-subject) struct array, and the grouping/fold runs as
    codegen'd higher-order array functions — no second shuffle for the
    predicate level, no Python.  Over the bucketed-by-subj storage layout
    even that exchange vanishes.  Blocks are deterministic: the struct
    array sorts by (pred_txt, obj_txt) before the fold.
    """
    pred_txt = F.when(F.col("pred") == _RDF_TYPE, F.lit("a")).otherwise(
        _compact_uri(F.col("pred"))
    )
    obj_txt = F.when(
        F.col("obj_kind") == "uri", _compact_uri(F.col("obj"))
    ).otherwise(
        to_n3(F.col("obj"), F.col("obj_kind"), F.col("lang"), F.col("dtype"))
    )
    po = triples.select(
        F.col("subj"),
        pred_txt.alias("p"),
        obj_txt.alias("o"),
    )
    init = F.struct(F.lit("").alias("prev"), F.lit("").alias("out"))

    def _fold(acc, x):
        first = acc["out"] == F.lit("")
        same = acc["prev"] == x["p"]
        out = (
            F.when(first, F.concat(x["p"], F.lit(" "), x["o"]))
            .when(same, F.concat(acc["out"], F.lit(", "), x["o"]))
            .otherwise(
                F.concat(
                    acc["out"], F.lit(" ;\n    "), x["p"], F.lit(" "), x["o"]
                )
            )
        )
        return F.struct(x["p"].alias("prev"), out.alias("out"))

    return po.groupBy("subj").agg(
        F.concat(
            subj_n3(F.col("subj")),
            F.lit(" "),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("p", "o"))),
                init,
                _fold,
                lambda acc: acc["out"],
            ),
            F.lit(" ."),
        ).alias("block")
    )


def write_turtle(triples: DataFrame, path: str) -> None:
    """Materialize grouped Turtle part files, each opening with the
    ``@prefix`` header (injected per partition through one Arrow pass —
    the serialization itself stays JVM-side)."""
    import pandas as pd

    from ..functions.workerenv import pinned

    header = turtle_header()

    @pinned
    def _with_header(batches):
        first = True
        for pdf in batches:
            if first:
                pdf = pd.concat(
                    [pd.DataFrame({"block": [header.rstrip("\n")]}), pdf],
                    ignore_index=True,
                )
                first = False
            yield pdf[["block"]]

    blocks = serialize_turtle(triples).select("block")
    blocks.mapInPandas(_with_header, "block string").write.mode(
        "overwrite"
    ).text(path)


def oracle_turtle_compact_sql(col: str) -> str:
    """DuckDB CASE chain mirroring ``_compact_uri`` — generated from the
    SAME prefix table so engine and oracle cannot silently diverge."""
    branches = "".join(
        f"WHEN {col} LIKE '{ns}%' AND regexp_matches(substr({col}, {len(ns) + 1}), '{_PN_LOCAL_RE}') "
        f"THEN '{pfx}:' || substr({col}, {len(ns) + 1})\n       "
        for pfx, ns in TURTLE_PREFIXES
    )
    return f"CASE {branches}ELSE '<' || {col} || '>' END"


def oracle_obj_n3_sql() -> str:
    """DuckDB expression for the object's N3 form (escape chain generated
    from ``terms.NT_ESCAPES``, same as :func:`oracle_line_sql`)."""
    lex = "obj"
    for raw, esc in NT_ESCAPES:

        def chrs(s: str) -> str:
            return " || ".join(
                f"chr({ord(c)})" if c in ("\\", "\n", "\r") else f"'{c}'"
                for c in s
            )

        lex = f"replace({lex}, {chrs(raw)}, {chrs(esc)})"
    return f"""'"' || {lex} || '"' ||
        CASE WHEN lang IS NOT NULL THEN '@' || lang
             WHEN dtype IS NOT NULL AND dtype <> '{XSD_STRING}'
                  THEN '^^<' || dtype || '>'
             ELSE '' END"""


def partition_lineage(
    edges: DataFrame, buckets: int = 64, salt: str = "lineage"
) -> DataFrame:
    """Per salted-conv_id-bucket lineage/metrics rows for the edge table.

    Content-keyed (sha256 bucket of conv_id), so the SAME rows come out at
    any parallelism, cluster size, or file split — the property that makes
    lineage comparable across runs and usable as a resume/consistency check
    (a resumed harvest must reproduce every bucket row bit-for-bit).
    """
    return (
        edges.withColumn(
            "bucket", sample_bucket(F.col("conv_id"), salt=salt, buckets=buckets)
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.countDistinct("subj").cast("long").alias("n_subjects"),
            F.min("turn_idx").cast("int").alias("min_turn"),
            F.max("turn_idx").cast("int").alias("max_turn"),
        )
    )
