"""SPARQL 1.1 Update subset — the reference's WRITE path, compiled to
set-algebra DataFrame plans over a triple-set snapshot.

The reference never writes the store through an API of its own: rdflib's
``SPARQLUpdateStore`` posts SPARQL *Update* requests to Virtuoso
(``store.py:19-54`` — ``node_to_sparql`` renders each term, ``Graph.add``
batches become ``INSERT DATA``; ``harvest.py:39`` binds the store to the
configured graph URI).  Here the graph is an edges DataFrame (one snapshot
of the triple table, term columns ``subj pred obj obj_kind lang dtype``)
and each update form compiles to the plan it denotes:

* ``INSERT DATA { ground triples }``  → set union (new rows dedup-joined
  against only the subject-sliver of the graph — the big side is never
  re-shuffled; see ``_set_insert``).
* ``DELETE DATA { ground triples }``  → null-safe LEFT ANTI join (the
  delete set broadcasts; the graph side is map-only).
* ``DELETE WHERE { patterns }``       → the pattern block is template AND
  where (spec §3.1.3.3); anti-join on the instantiated solutions.
* ``DELETE {t1} INSERT {t2} WHERE {g}`` → both templates instantiate
  against the SAME solution multiset evaluated on the PRE-update graph
  (spec §3.1.3: "the WHERE clause is matched against the graph store
  *before* any of this operation's deletions/insertions"), deletes apply
  before inserts.
* ``CLEAR [SILENT] [GRAPH <g>|DEFAULT|ALL]`` → the empty graph (the
  harvester wipes its named graph before a full re-harvest).

``;``-separated requests apply sequentially, each op seeing the previous
op's result (spec §3: operations in a request execute in order).

Template instantiation reuses :func:`..plans.sparql.compile_construct`
(one pass over the solution join, object term metadata carried through),
so the WHERE subset is the CONSTRUCT subset: BGP + BIND + FILTER incl.
[NOT] EXISTS — anything wider is *refused*, never mis-executed.

Scale notes (100 TB graph, sliver-sized update):

* DELETE is a broadcast anti-join — the graph is scanned once, map-only.
* INSERT set-dedup never shuffles the graph: the only graph rows that can
  collide with an insert share a subject with it, so the membership probe
  is ``graph LEFT SEMI broadcast(insert subjects)`` (map-only on the big
  side) and the anti-join runs against that sliver.  A naive
  ``union().distinct()`` would re-shuffle the whole graph on every update;
  this is the ``MERGE INTO`` shape an Iceberg deployment would use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .sparql import (
    ConstructQuery,
    Lit,
    Query,
    SparqlError,
    SparqlUnsupported,
    Term,
    Uri,
    Var,
    _Parser,
    compile_construct,
)

TERM_COLS = ["subj", "pred", "obj", "obj_kind", "lang", "dtype"]


@dataclass
class UpdateOp:
    """One operation of an update request.

    kind ∈ {insert_data, delete_data, delete_where, modify, clear};
    ``data`` holds ground rows (term-column dicts) for the DATA forms,
    ``delete_tpl``/``insert_tpl`` + ``where`` the modify templates.
    """

    kind: str
    data: list[dict] = field(default_factory=list)
    delete_tpl: list[tuple[Term, Term, Term]] = field(default_factory=list)
    insert_tpl: list[tuple[Term, Term, Term]] = field(default_factory=list)
    where: Query | None = None


# ---------------------------------------------------------------------------
# parsing


def _ground_rows(
    triples: list[tuple[Term, Term, Term]], form: str
) -> list[dict]:
    rows: list[dict] = []
    for (s, p, o) in triples:
        for t, pos in ((s, "subject"), (p, "predicate"), (o, "object")):
            if isinstance(t, Var):
                raise SparqlError(
                    f"variable ?{t.name} in {form} {pos} (must be ground)"
                )
        if not isinstance(p, Uri):
            raise SparqlUnsupported(f"property path in {form}")
        if isinstance(s, Lit):
            raise SparqlError(f"literal subject in {form}")
        row = {
            "subj": s.value,
            "pred": p.value,
            "obj": o.value if isinstance(o, Uri) else o.lex,
            "obj_kind": "uri" if isinstance(o, Uri) else "literal",
            "lang": o.lang if isinstance(o, Lit) else None,
            "dtype": o.dtype if isinstance(o, Lit) else None,
        }
        if row not in rows:  # DATA blocks are tiny; set semantics up front
            rows.append(row)
    return rows


def _check_template(tpl: list[tuple[Term, Term, Term]], form: str) -> None:
    for (s, p, o) in tpl:
        if not isinstance(p, (Uri, Var)):
            raise SparqlUnsupported(f"property path in a {form} template")
        for t in (s, p, o):
            if isinstance(t, Var) and t.name.startswith("__seq"):
                raise SparqlUnsupported(f"sequence path in a {form} template")


class _UpdateParser(_Parser):
    def parse_update(self) -> list[UpdateOp]:
        while self._kw("PREFIX"):
            pname = self.next()
            if not pname.endswith(":"):
                raise SparqlError(f"bad prefix declaration {pname!r}")
            uri = self.next()
            if not uri.startswith("<"):
                raise SparqlError("prefix IRI must be <...>")
            self.prefixes[pname[:-1]] = uri[1:-1]
        ops: list[UpdateOp] = [self._operation()]
        while self.peek() == ";":
            self.next()
            if self.peek() is None:  # trailing ';' is legal
                break
            ops.append(self._operation())
        if self.peek() is not None:
            raise SparqlUnsupported(f"trailing content at {self.peek()!r}")
        return ops

    def _operation(self) -> UpdateOp:
        tok = self.peek()
        if tok is None:
            raise SparqlError("empty update operation")
        kw = tok.upper()
        if kw == "CLEAR":
            return self._clear()
        if kw == "INSERT":
            self.next()
            if self._kw("DATA"):
                return UpdateOp(
                    "insert_data",
                    data=_ground_rows(self._group_triples(), "INSERT DATA"),
                )
            # INSERT {t} WHERE {g} (modify form without a DELETE template)
            tpl = self._group_triples()
            _check_template(tpl, "INSERT")
            self.expect("WHERE")
            return UpdateOp(
                "modify", insert_tpl=tpl, where=self._where_query()
            )
        if kw == "DELETE":
            self.next()
            if self._kw("DATA"):
                return UpdateOp(
                    "delete_data",
                    data=_ground_rows(self._group_triples(), "DELETE DATA"),
                )
            if self._kw("WHERE"):
                # DELETE WHERE {patterns}: the block is template AND where
                pats = self._group_triples()
                _check_template(pats, "DELETE WHERE")
                for (s, p, o) in pats:
                    if not isinstance(p, (Uri, Var)):
                        raise SparqlUnsupported(
                            "property path in DELETE WHERE"
                        )
                q = Query(
                    select=[], distinct=False, patterns=list(pats),
                    optionals=[], filters=[], order_by=[], limit=None,
                )
                return UpdateOp("modify", delete_tpl=pats, where=q)
            del_tpl = self._group_triples()
            _check_template(del_tpl, "DELETE")
            ins_tpl: list[tuple[Term, Term, Term]] = []
            if self._kw("INSERT"):
                ins_tpl = self._group_triples()
                _check_template(ins_tpl, "INSERT")
            self.expect("WHERE")
            return UpdateOp(
                "modify",
                delete_tpl=del_tpl,
                insert_tpl=ins_tpl,
                where=self._where_query(),
            )
        raise SparqlUnsupported(f"unsupported update form {tok!r}")

    def _clear(self) -> UpdateOp:
        self.next()
        self._kw("SILENT")
        if self._kw("GRAPH"):
            # this store holds exactly ONE graph with no name: executing a
            # CLEAR GRAPH <iri> against it would wipe that graph no matter
            # which IRI was named — a destructive mis-execution of a
            # request that targets some OTHER named graph.  Refuse instead
            # (the module contract: anything wider than the subset is
            # refused, never mis-executed); only CLEAR / CLEAR DEFAULT /
            # CLEAR ALL address the stored graph.
            tok = self.next()
            raise SparqlUnsupported(
                f"CLEAR GRAPH {tok!r}: named graphs are not supported "
                "(single unnamed graph store); use CLEAR DEFAULT"
            )
        nxt = self.peek()
        if nxt is not None and nxt.upper() in ("DEFAULT", "NAMED", "ALL"):
            self.next()
            if nxt.upper() == "NAMED":
                # zero named graphs exist: clearing them is a no-op, NOT a
                # wipe of the default graph
                return UpdateOp("noop")
        return UpdateOp("clear")


def parse_update(text: str) -> list[UpdateOp]:
    """Parse a SPARQL Update request into its operation sequence."""
    return _UpdateParser(text).parse_update()


# ---------------------------------------------------------------------------
# compilation


def _null_safe_cond(left: DataFrame, right: DataFrame):
    cond = None
    for c in TERM_COLS:
        eq = left[c].eqNullSafe(right[c])
        cond = eq if cond is None else (cond & eq)
    return cond


def _ground_df(spark, rows: list[dict]) -> DataFrame:
    from ..schema import TRIPLE_STRUCT

    data = [
        tuple(r[f.name] for f in TRIPLE_STRUCT.fields) for r in rows
    ]
    return spark.createDataFrame(data, TRIPLE_STRUCT)


def _set_delete(graph: DataFrame, dels: DataFrame) -> DataFrame:
    """graph ∖ dels — null-safe anti-join; the delete set is the build
    side (broadcast under AQE when sliver-sized), the graph is map-only."""
    d = dels.select(*TERM_COLS).alias("__d")
    g = graph.alias("__g")
    return g.join(d, _null_safe_cond(g, d), "left_anti")


def _set_insert(graph: DataFrame, ins: DataFrame) -> DataFrame:
    """graph ∪ ins without re-shuffling the graph: only graph rows sharing
    a subject with an insert can collide, so the membership probe anti-joins
    the inserts against that subject-restricted sliver.  No broadcast hint:
    AQE broadcasts the subject set while it is sliver-sized (the harvester's
    usage) and degrades to a shuffle join for graph-scale instantiations
    instead of exceeding the broadcast ceiling."""
    i = ins.select(*TERM_COLS).distinct().alias("__i")
    sliver = (
        graph.join(i.select("subj").distinct(), "subj", "left_semi")
        .select(*TERM_COLS)
        .alias("__s")
    )
    new_rows = i.join(sliver, _null_safe_cond(i, sliver), "left_anti")
    return graph.select(*TERM_COLS).unionByName(new_rows)


def _instantiate(
    graph: DataFrame, tpl: list[tuple[Term, Term, Term]], where: Query
) -> DataFrame:
    return compile_construct(graph, ConstructQuery(template=tpl, where=where))


def apply_update(edges: DataFrame, request: "str | list[UpdateOp]") -> DataFrame:
    """Apply a SPARQL Update request to a triple-set snapshot.

    Returns the post-update graph as a DataFrame with the term columns
    (``subj pred obj obj_kind lang dtype``) — commit it through
    ``storage.table_for(...).overwrite`` for the harvester's
    wipe-and-replace semantics, or diff it for an incremental commit.
    The input is treated as a triple SET (the merged-edges invariant).
    """
    ops = parse_update(request) if isinstance(request, str) else request
    spark = edges.sparkSession
    graph = edges.select(*TERM_COLS)
    for op in ops:
        if op.kind == "noop":
            continue
        elif op.kind == "clear":
            graph = spark.createDataFrame([], graph.schema)
        elif op.kind == "insert_data":
            graph = _set_insert(graph, _ground_df(spark, op.data))
        elif op.kind == "delete_data":
            graph = _set_delete(graph, _ground_df(spark, op.data))
        elif op.kind == "modify":
            # both templates instantiate against the PRE-op graph
            dels = (
                _instantiate(graph, op.delete_tpl, op.where)
                if op.delete_tpl
                else None
            )
            ins = (
                _instantiate(graph, op.insert_tpl, op.where)
                if op.insert_tpl
                else None
            )
            if dels is not None:
                graph = _set_delete(graph, dels)
            if ins is not None:
                graph = _set_insert(graph, ins)
        else:  # pragma: no cover - parser emits only the kinds above
            raise SparqlUnsupported(f"update kind {op.kind!r}")
    return graph
