"""SHACL-style validation as DataFrame aggregations (SURVEY.md §2.2/2.4).

The reference outsources validation to the remote ITB SHACL API
(validator.py:14-15,56-71) and checks the report for ``sh:conforms true``,
falling back (non-strict) to "no sh:Violation results" (validator.py:34-53).
In-engine we evaluate the same *class* of constraints — min/max cardinality
per (targetClass, property), the core of the BRegDCAT-AP shapes
(e.g. Catalog: >=1 dct:description, exactly 1 dct:identifier, >=1 dct:title,
exactly 1 dct:publisher; Agent: >=1 foaf:name —
BRegDCAT-AP_shacl_shapes_2.00.ttl:717-760 region) — directly on the edge
table with groupBy().count() per entity.

Semantics preserved:
* P1  validate-then-gate: ``harvest.py:41-47`` aborts the whole job if any
  source is invalid (all-or-nothing) — ``gate_all_or_nothing``.
* P2/P3 strict vs lenient: strict requires full conformance; lenient accepts
  entities with no *Violation*-severity result.  We tag each constraint with
  a severity; lenient mode only fails on 'Violation'.
* P4  disabled validator (DummyValidator, validator.py:134-141) -> lit(True).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import CLASS_URIS, DCT, FOAF, RDF_TYPE


@dataclass(frozen=True)
class Shape:
    """One cardinality constraint: class + property + [min,max] + severity."""

    target_class: str
    path: str
    min_count: int = 0
    max_count: int | None = None
    severity: str = "Violation"


# The constraint subset exercised by the sample corpus (SHACL shapes cited in
# the module docstring).
DEFAULT_SHAPES = [
    Shape(CLASS_URIS["Catalog"], DCT + "description", min_count=1),
    Shape(CLASS_URIS["Catalog"], DCT + "identifier", min_count=1, max_count=1),
    Shape(CLASS_URIS["Catalog"], DCT + "title", min_count=1),
    Shape(CLASS_URIS["Catalog"], DCT + "publisher", min_count=1, max_count=1),
    Shape(CLASS_URIS["Agent"], FOAF + "name", min_count=1),
    Shape(CLASS_URIS["Dataset"], DCT + "identifier", min_count=1, max_count=1, severity="Warning"),
]


def validation_report(edges: DataFrame, shapes: list[Shape] | None = None) -> DataFrame:
    """Violations table: one row per (entity, constraint) breach.

    Columns: subj, entity_type, path, count, min_count, max_count, severity.
    Mirrors the ITB report triples the reference scans for
    ``sh:resultSeverity sh:Violation`` (validator.py:50-51).
    """
    shapes = shapes if shapes is not None else DEFAULT_SHAPES
    spark = edges.sparkSession
    shapes_df = spark.createDataFrame(
        [(s.target_class, s.path, s.min_count, s.max_count, s.severity) for s in shapes],
        "target_class string, path string, min_count int, max_count int, severity string",
    )

    # ONE groupBy(subj) computes everything the checks need: the entity's
    # type set plus a distinct-object count per constrained path (the shape
    # paths are a small fixed set, so one conditional count_distinct column
    # each).  The former three-stage form (typed distinct + per-(subj,pred)
    # counts + subj join) shuffled three times for the same information.
    paths = sorted({s.path for s in shapes})
    per_subj = (
        edges.filter(
            (F.col("pred") == RDF_TYPE) | F.col("pred").isin(*paths)
        )
        .groupBy("subj")
        .agg(
            F.array_sort(
                F.array_distinct(
                    F.collect_list(
                        F.when(F.col("pred") == RDF_TYPE, F.col("obj"))
                    )
                )
            ).alias("types"),
            *[
                F.count_distinct(
                    F.when(F.col("pred") == p, F.col("obj"))
                ).alias(f"_c{i}")
                for i, p in enumerate(paths)
            ],
        )
        .filter(F.size("types") > 0)
    )
    # multi-typed entities get every applicable shape, as before
    exploded = per_subj.select(
        "subj", F.explode("types").alias("entity_type"),
        *[f"_c{i}" for i in range(len(paths))],
    )
    cnt = F.lit(None).cast("long")
    for i, p in enumerate(paths):
        cnt = F.when(F.col("path") == p, F.col(f"_c{i}")).otherwise(cnt)
    checks = (
        exploded.join(
            F.broadcast(shapes_df),
            exploded["entity_type"] == shapes_df["target_class"],
        )
        .withColumn("count", cnt)
        .select(
            "subj", "entity_type", "path", "count",
            "min_count", "max_count", "severity",
        )
    )
    return checks.filter(
        (F.col("count") < F.col("min_count"))
        | (F.col("max_count").isNotNull() & (F.col("count") > F.col("max_count")))
    )


def conforms_column(
    edges: DataFrame,
    shapes: list[Shape] | None = None,
    strict: bool = False,
    disabled: bool = False,
) -> DataFrame:
    """Per-entity boolean verdict (P2/P3/P4): subj, conforms.

    strict=False (the reference default, validator.py:46-48) tolerates
    non-Violation severities; disabled=True reproduces DummyValidator.
    """
    typed = edges.filter(F.col("pred") == RDF_TYPE).select("subj").distinct()
    if disabled:
        return typed.withColumn("conforms", F.lit(True))
    report = validation_report(edges, shapes)
    if not strict:
        report = report.filter(F.col("severity") == "Violation")
    bad = report.select("subj").distinct().withColumn("_bad", F.lit(True))
    return typed.join(bad, "subj", "left").select(
        "subj", F.coalesce(~F.col("_bad"), F.lit(True)).alias("conforms")
    )


def partition_valid(edges: DataFrame, verdicts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P1: split edges into (valid, quarantine) by their subject's verdict."""
    v = verdicts.withColumnRenamed("subj", "_vsubj")
    joined = edges.join(v, edges["subj"] == v["_vsubj"], "left").drop("_vsubj")
    ok = F.coalesce(F.col("conforms"), F.lit(True))
    return (
        joined.filter(ok).drop("conforms"),
        joined.filter(~ok).drop("conforms"),
    )


def gate_all_or_nothing(verdicts: DataFrame) -> None:
    """harvest.py:41-47 semantics: any invalid entity aborts the run."""
    n_bad = verdicts.filter(~F.col("conforms")).count()
    if n_bad:
        raise ValueError(f"Invalid entities found (n={n_bad}); aborting harvest")


@dataclass(frozen=True)
class ValueShape:
    """One value-level constraint (SHACL sh:nodeKind / sh:datatype /
    sh:pattern): class + property + the required term form.

    ``node_kind`` in {'IRI', 'Literal'}; ``datatype`` compares against the
    RDF 1.1 EFFECTIVE datatype (lang-tagged -> rdf:langString, plain ->
    xsd:string); ``pattern`` is a regex in the Java∩RE2 dialect subset
    (same discipline as pii.py) over the lexical form.  Any specified
    check that fails produces a violation row."""

    target_class: str
    path: str
    node_kind: str | None = None
    datatype: str | None = None
    pattern: str | None = None
    severity: str = "Violation"


_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def value_violations(
    edges: DataFrame, shapes: list[ValueShape]
) -> DataFrame:
    """Value-level violations: one row per (entity, path, value, failed
    check) — columns subj, entity_type, path, value, constraint,
    severity.

    Plan shape: the typed-entity slice joins the constrained-path slice
    once (both filters push to the scan); the shape table broadcasts; all
    three checks are codegen'd Column predicates evaluated per edge — no
    per-entity aggregation is needed for value constraints, so the only
    exchange is the subj equi-join of the two slices.
    """
    if not shapes:
        raise ValueError("value_violations expects at least one shape")
    spark = edges.sparkSession
    shapes_df = spark.createDataFrame(
        [
            (s.target_class, s.path, s.node_kind, s.datatype, s.pattern, s.severity)
            for s in shapes
        ],
        "target_class string, path string, node_kind string, "
        "datatype string, pattern string, severity string",
    )
    typed = (
        edges.filter(F.col("pred") == RDF_TYPE)
        .select("subj", F.col("obj").alias("entity_type"))
        .distinct()
    )
    paths = sorted({s.path for s in shapes})
    vals = edges.filter(F.col("pred").isin(paths)).select(
        "subj", F.col("pred").alias("path"), "obj", "obj_kind", "lang", "dtype"
    )
    effective_dtype = F.when(
        F.col("obj_kind") != "literal", F.lit(None).cast("string")
    ).when(F.col("lang").isNotNull(), F.lit(_RDF_LANGSTRING)).otherwise(
        F.coalesce(F.col("dtype"), F.lit(_XSD_STRING))
    )
    joined = (
        vals.join(typed, "subj")
        .join(
            F.broadcast(shapes_df),
            (F.col("entity_type") == F.col("target_class"))
            & (vals["path"] == shapes_df["path"]),
        )
        .drop(shapes_df["path"])
        .withColumn("eff_dtype", effective_dtype)
    )
    nk_bad = F.col("node_kind").isNotNull() & (
        F.when(F.col("node_kind") == "IRI", F.col("obj_kind") != "uri")
        .when(F.col("node_kind") == "Literal", F.col("obj_kind") != "literal")
        .otherwise(F.lit(True))  # unknown node_kind: fail loudly per row
    )
    dt_bad = F.col("datatype").isNotNull() & (
        (F.col("obj_kind") != "literal")
        | (F.col("eff_dtype") != F.col("datatype"))
    )
    pat_bad = F.col("pattern").isNotNull() & ~F.regexp_like(
        F.col("obj"), F.col("pattern")
    )
    checks = [("nodeKind", nk_bad), ("datatype", dt_bad), ("pattern", pat_bad)]
    rows = joined.select(
        "subj", "entity_type", "path", F.col("obj").alias("value"), "severity",
        F.array(
            *[F.when(cond, F.lit(name)) for name, cond in checks]
        ).alias("_fails"),
    ).select(
        "subj", "entity_type", "path", "value",
        F.explode("_fails").alias("check_kind"), "severity",
    ).filter(F.col("check_kind").isNotNull())
    return rows.select(
        "subj", "entity_type", "path", "value", "check_kind", "severity"
    ).distinct()
