"""RDFS entailment materialization — schema-driven triple inference (ours).

The reference stores exactly the triples its sources assert (harvest.py
merges, validates, INSERTs); any DCAT-AP profile work that needs inferred
types (``?x a dcat:Resource`` because ``dcat:Dataset ⊑ dcat:Resource``)
leans on Virtuoso's optional inference.  A KG-construction pipeline wants
that closure MATERIALIZED — queries then run on the entailed graph with no
per-query reasoning.  This operator computes the practical RDFS subset
(ρdf: subClassOf / subPropertyOf / domain / range) as one deterministic
dataflow:

1. schema sliver: the subClassOf / subPropertyOf edges and domain / range
   assertions are filtered out of the graph — schema is vocabulary-sized
   (thousands of rows at most against billions of instance triples), so
   its transitive closures (``paths.reachable_pairs`` on each predicate)
   are sliver-sized plan inputs that BROADCAST into every instance join;
2. subPropertyOf: every instance triple ``x p y`` with ``p ⊑* q`` emits
   ``x q y`` (rdfs7) — one broadcast join, BEFORE domain/range so derived
   properties trigger them (the ρdf rule ordering that reaches fixpoint
   in one pass);
3. domain/range: ``x p y`` with ``domain(p)=C`` emits ``x a C``; with
   ``range(p)=C`` and a URI object emits ``y a C`` (rdfs2/rdfs3);
4. subClassOf: every type triple (asserted or just derived) with
   ``C ⊑* D`` emits the supertype memberships (rdfs9) — applied LAST so
   types produced by domain/range inherit too.

That ordering is a fixpoint for the rule subset: subproperty closure is
transitive up front, domain/range only consume property triples (never
produce them), and subclass inheritance only consumes/produces type
triples (class hierarchies reached via rdfs9 are already transitively
closed).  Output = asserted ∪ entailed, distinct — set semantics like
``merge_triples``.  Every instance-sized operation is ONE broadcast join
of the corpus against a schema closure; the corpus never self-joins and
shuffles only for the final distinct (skippable via ``dedup=False`` when
the consumer dedups anyway, e.g. a snapshot MERGE write).

Reference basis: W3C RDF 1.1 Semantics §9.2 entailment patterns
(rdfs2, rdfs3, rdfs7, rdfs9, rdfs5/rdfs11 via the transitive closures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import RDF_TYPE

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SUBCLASS = RDFS + "subClassOf"
SUBPROP = RDFS + "subPropertyOf"
DOMAIN = RDFS + "domain"
RANGE = RDFS + "range"

TERM_COLS = ["subj", "pred", "obj", "obj_kind", "lang", "dtype"]


def _closure(edges: DataFrame, pred: str, max_hops: int) -> DataFrame:
    """(sub, sup) transitive closure of a schema predicate — sliver-sized
    (schema is vocabulary-bounded), checkpointed inside reachable_pairs."""
    from .paths import reachable_pairs

    return reachable_pairs(edges, preds=[pred], max_hops=max_hops).select(
        F.col("src").alias("sub"), F.col("dst").alias("sup")
    )


def _type_row(subj, cls) -> list:
    null_str = F.lit(None).cast("string")
    return [
        subj.alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        cls.alias("obj"),
        F.lit("uri").alias("obj_kind"),
        null_str.alias("lang"),
        null_str.alias("dtype"),
    ]


def rdfs_closure(
    edges: DataFrame, max_hops: int = 10, dedup: bool = True
) -> DataFrame:
    """Asserted ∪ RDFS-entailed triples (term columns, set semantics).

    ``max_hops`` bounds the schema hierarchies' depth (vocabulary
    hierarchies are shallow; 10 covers every real ontology this pipeline
    maps).  ``dedup=False`` skips the final corpus-wide distinct for
    consumers that dedup downstream anyway.
    """
    g = edges.select(*TERM_COLS)
    sub_cls = _closure(edges, SUBCLASS, max_hops)
    sub_prp = _closure(edges, SUBPROP, max_hops)
    dom = (
        edges.filter((F.col("pred") == DOMAIN) & (F.col("obj_kind") == "uri"))
        .select(F.col("subj").alias("p"), F.col("obj").alias("cls"))
        .distinct()
    )
    rng = (
        edges.filter((F.col("pred") == RANGE) & (F.col("obj_kind") == "uri"))
        .select(F.col("subj").alias("p"), F.col("obj").alias("cls"))
        .distinct()
    )

    # rdfs7: x p y, p ⊑* q  ⇒  x q y  (carries the object's term metadata)
    by_subprop = (
        g.join(
            F.broadcast(sub_prp), g["pred"] == sub_prp["sub"], "inner"
        )
        .select(
            "subj",
            F.col("sup").alias("pred"),
            "obj", "obj_kind", "lang", "dtype",
        )
    )
    # property triples visible to domain/range = asserted ∪ rdfs7-derived
    prop_triples = g.unionByName(by_subprop)

    # rdfs2: x p y, domain(p)=C  ⇒  x a C
    by_domain = prop_triples.join(
        F.broadcast(dom), prop_triples["pred"] == dom["p"], "inner"
    ).select(*_type_row(F.col("subj"), F.col("cls")))
    # rdfs3: x p y (y a URI), range(p)=C  ⇒  y a C
    by_range = (
        prop_triples.filter(F.col("obj_kind") == "uri")
        .join(F.broadcast(rng), prop_triples["pred"] == rng["p"], "inner")
        .select(*_type_row(F.col("obj"), F.col("cls")))
    )

    # rdfs9: x a C, C ⊑* D  ⇒  x a D — over asserted AND derived types
    types = (
        prop_triples.filter(F.col("pred") == RDF_TYPE)
        .select("subj", "obj")
        .unionByName(by_domain.select("subj", "obj"))
        .unionByName(by_range.select("subj", "obj"))
    )
    by_subclass = types.join(
        F.broadcast(sub_cls), types["obj"] == sub_cls["sub"], "inner"
    ).select(*_type_row(F.col("subj"), F.col("sup")))

    # rdfs5/rdfs11: the entailed schema triples themselves (transitive
    # subClassOf / subPropertyOf pairs) — sliver-sized
    null_str = F.lit(None).cast("string")

    def _schema_rows(closure: DataFrame, pred: str) -> DataFrame:
        return closure.select(
            F.col("sub").alias("subj"),
            F.lit(pred).alias("pred"),
            F.col("sup").alias("obj"),
            F.lit("uri").alias("obj_kind"),
            null_str.alias("lang"),
            null_str.alias("dtype"),
        )

    out = (
        g.unionByName(by_subprop)
        .unionByName(by_domain)
        .unionByName(by_range)
        .unionByName(by_subclass)
        .unionByName(_schema_rows(sub_cls, SUBCLASS))
        .unionByName(_schema_rows(sub_prp, SUBPROP))
    )
    return out.dropDuplicates(TERM_COLS) if dedup else out
