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
