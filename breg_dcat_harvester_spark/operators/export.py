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
N-Triples line, with RDF 1.1 STRING_LITERAL_QUOTE escaping (backslash,
double quote, LF, CR — the four code points the grammar forbids raw).  The
DuckDB oracle mirrors the escape chain character-for-character, so the
contract query asserts byte-identical lines.

``partition_lineage`` is the north-rule "per-partition lineage + metrics
rows" as a *content-keyed* table: edges roll up per salted conv_id bucket
(the same sha256 recipe as sampling/sharding — engine-replayable, skew-free
by construction), giving (bucket, n_edges, n_convs, n_subjects, turn span)
rows that are deterministic across cluster sizes and re-runs — unlike
physical partition ids, which depend on the scan split.  One hash-agg
shuffle on the bucket key; count-distincts expand map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import XSD
from .sampling import sample_bucket

XSD_STRING = XSD + "string"

# RDF 1.1 N-Triples STRING_LITERAL_QUOTE: ECHAR-escape exactly the code
# points the production forbids unescaped.  ORDER MATTERS: backslash first,
# or the escapes just introduced would be re-escaped.
_NT_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r")]


def escape_nt_literal(col: Column) -> Column:
    """RDF 1.1 N-Triples literal escaping as a codegen Column expression."""
    out = col
    for raw, esc in _NT_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def obj_nt(obj: Column, obj_kind: Column, lang: Column, dtype: Column) -> Column:
    """Canonical N-Triples object term (escaped twin of functions.terms.to_n3;
    reference store.py:25 ``node.n3()``)."""
    lex = F.concat(F.lit('"'), escape_nt_literal(obj), F.lit('"'))
    lex = F.when(lang.isNotNull(), F.concat(lex, F.lit("@"), lang)).otherwise(
        F.when(
            dtype.isNotNull() & (dtype != F.lit(XSD_STRING)),
            F.concat(lex, F.lit("^^<"), dtype, F.lit(">")),
        ).otherwise(lex)
    )
    return F.when(
        obj_kind == F.lit("uri"), F.concat(F.lit("<"), obj, F.lit(">"))
    ).otherwise(lex)


def serialize_ntriples(triples: DataFrame) -> DataFrame:
    """One canonical N-Triples line per triple — ``line: string``.

    Map-only (no exchange): the writer can stream any partitioning straight
    to per-partition ``.nt`` part files, and concatenation is a valid graph
    document.  Subjects and predicates are URIs post-skolemization
    (store.py:19-25), so only the object needs the literal branch.
    """
    return triples.select(
        F.concat(
            F.lit("<"),
            F.col("subj"),
            F.lit("> <"),
            F.col("pred"),
            F.lit("> "),
            obj_nt(F.col("obj"), F.col("obj_kind"), F.col("lang"), F.col("dtype")),
            F.lit(" ."),
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Materialize the graph as partition-parallel ``.nt`` text files."""
    serialize_ntriples(triples).write.mode("overwrite").text(path)


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
