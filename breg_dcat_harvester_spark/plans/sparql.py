"""Minimal SPARQL SELECT compiler → Spark DataFrame plans.

The reference's entire query surface is SPARQL text shipped to Virtuoso
(browser.py:167-244 five facet BGPs; browser.py:337-405 the 9-pattern search
star with conjunctive ``FILTER (?v IN (...))``; browser.py:262-296 the
12-var detail query with one OPTIONAL pattern).  The hand-built operators
(operators/facets.py, operators/search.py) re-express those templates as
DataFrame builders; this module closes the remaining gap for a reference
user who has their OWN query text: the subset of SPARQL the reference
actually uses — PREFIX, SELECT [DISTINCT] ?vars, '.'-separated triple
patterns, ``a`` shorthand, OPTIONAL { ... }, FILTER (?v IN (...)) joined by
&&, ORDER BY, LIMIT — parses and compiles to a DataFrame over the merged
edges table, so the verbatim reference templates run unchanged (tested
pattern-for-pattern equal to the hand-built builders, and oracle-gated via
the driver contract).

Compilation is Catalyst-first by construction — the compiler emits the SAME
plan shapes the hand-built operators were tuned to (PLANS.md audit):

* each triple pattern becomes a pred/obj-filtered slice of the edges scan —
  the filters reach the parquet reader (predicate pushdown; with a
  pred-partitioned layout they prune files);
* shared variables become equi-join keys, patterns joined in written order
  (the reference's templates lead with the most selective ``rdf:type``
  patterns); AQE broadcasts slices that fit, exactly as in the hand-built
  star;
* no ``.distinct()`` per pattern: ``edges`` is the merged graph — a SET of
  triples — so a pred-fixed slice is already distinct (the same argument
  that removed 9 wasted shuffles from search_star);
* OPTIONAL compiles to a left outer join on the shared variables (J7);
  variables bound only inside OPTIONAL surface as NULL when unmatched;
* FILTER ... IN compiles to ``Column.isin`` (P6), conjunctions to AND;
* SELECT DISTINCT → one final distinct; a projected variable no pattern
  binds yields a NULL column (SPARQL unbound semantics — the reference's
  facet templates project a never-bound ?predicate);
* determinism: ORDER BY when present; otherwise any LIMIT is preceded by an
  orderBy on the projected variables (Virtuoso's unordered LIMIT is not
  reproducible; same convention as the hand-built builders).

Out-of-subset constructs (UNION, property paths, sub-SELECT, BIND, regex
FILTERs, …) raise ``SparqlUnsupported`` — never silently mis-execute.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlError(ValueError):
    pass


class SparqlUnsupported(SparqlError):
    pass


# ---------------------------------------------------------------------------
# terms
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Uri:
    value: str


@dataclass(frozen=True)
class Lit:
    lex: str
    lang: str | None = None
    dtype: str | None = None


@dataclass(frozen=True)
class PathPlus:
    """SPARQL 1.1 one-or-more property path (``pred+``) — predicate
    position only; compiled to operators.paths.reachable_pairs."""
    pred: "Uri"


Term = Var | Uri | Lit


@dataclass
class Query:
    select: list[str]
    distinct: bool
    patterns: list[tuple[Term, Term, Term]]
    optionals: list[list[tuple[Term, Term, Term]]]
    filters: list[tuple[str, list[Term]]]  # (?var, IN-list)
    order_by: list[tuple[str, bool]]  # (var, ascending)
    limit: int | None


# ---------------------------------------------------------------------------
# tokenizer / parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<uri><[^>\s]*>)
    | (?P<lit>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>\s]*>|\^\^[A-Za-z_][\w.-]*:[\w.-]+)?)
    | (?P<var>\?[A-Za-z_][\w]*)
    | (?P<pname>[A-Za-z_][\w.-]*:[\w.%-]*)
    | (?P<kw>[A-Za-z_][\w]*)
    | (?P<num>\d+)
    | (?P<punct>\{|\}|\(|\)|\.|,|;|&&|\|\||\+|/)
    """,
    re.VERBOSE,
)

_ESC = re.compile(r"\\(.)")


def _tokens(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        ch = text[pos]
        if ch.isspace():
            pos += 1
            continue
        m = _TOKEN.match(text, pos)
        if not m:
            raise SparqlError(f"lex error at …{text[pos:pos + 30]!r}")
        pos = m.end()
        if m.lastgroup != "comment":
            out.append(m.group(0))
    return out


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokens(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # -- token plumbing ----------------------------------------------------
    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SparqlError("unexpected end of query")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, want: str) -> None:
        tok = self.next()
        if tok.upper() != want.upper():
            raise SparqlError(f"expected {want!r}, got {tok!r}")

    def _kw(self, word: str) -> bool:
        tok = self.peek()
        if tok is not None and tok.upper() == word:
            self.i += 1
            return True
        return False

    # -- terms -------------------------------------------------------------
    def term(self) -> Term:
        tok = self.next()
        if tok.startswith("?"):
            return Var(tok[1:])
        if tok.startswith("<"):
            return Uri(tok[1:-1])
        if tok == "a":
            return Uri(RDF_TYPE)
        if tok.startswith('"'):
            return self._literal(tok)
        if ":" in tok:
            return Uri(self._expand(tok))
        raise SparqlError(f"cannot parse term {tok!r}")

    def _expand(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise SparqlError(f"undeclared prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def _literal(self, tok: str) -> Lit:
        m = re.match(
            r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^(<[^>]*>|[\w.-]+:[\w.-]+))?$',
            tok,
        )
        if not m:
            raise SparqlError(f"bad literal {tok!r}")
        lex = _ESC.sub(lambda g: {"n": "\n", "t": "\t", "r": "\r"}.get(g.group(1), g.group(1)), m.group(1))
        lang = m.group(2)
        dt = m.group(3)
        if dt:
            dt = dt[1:-1] if dt.startswith("<") else self._expand(dt)
        return Lit(lex, lang, dt)

    # -- grammar -----------------------------------------------------------
    def parse(self) -> Query:
        while self._kw("PREFIX"):
            pname = self.next()
            if not pname.endswith(":"):
                raise SparqlError(f"bad prefix declaration {pname!r}")
            uri = self.next()
            if not uri.startswith("<"):
                raise SparqlError("prefix IRI must be <...>")
            self.prefixes[pname[:-1]] = uri[1:-1]

        self.expect("SELECT")
        distinct = self._kw("DISTINCT")
        select: list[str] = []
        while (tok := self.peek()) is not None and tok.startswith("?"):
            select.append(self.next()[1:])
        if not select:
            raise SparqlUnsupported("SELECT * / expressions not supported")

        self.expect("WHERE")
        self.expect("{")
        patterns: list[tuple[Term, Term, Term]] = []
        optionals: list[list[tuple[Term, Term, Term]]] = []
        filters: list[tuple[str, list[Term]]] = []
        while True:
            tok = self.peek()
            if tok is None:
                raise SparqlError("unterminated WHERE group")
            if tok == "}":
                self.next()
                break
            if tok == ".":  # stray separator (the reference emits `} .`)
                self.next()
                continue
            if tok.upper() == "OPTIONAL":
                self.next()
                self.expect("{")
                group: list[tuple[Term, Term, Term]] = []
                while self.peek() != "}":
                    if self.peek() == ".":
                        self.next()
                        continue
                    group.extend(self._triple())
                self.next()
                if not group:
                    raise SparqlError("empty OPTIONAL group")
                optionals.append(group)
                continue
            if tok.upper() == "FILTER":
                self.next()
                filters.extend(self._filter())
                continue
            if tok.upper() in ("UNION", "BIND", "MINUS", "GRAPH", "SERVICE"):
                raise SparqlUnsupported(f"{tok.upper()} is outside the supported subset")
            patterns.extend(self._triple())

        order_by: list[tuple[str, bool]] = []
        if self._kw("ORDER"):
            self.expect("BY")
            while (tok := self.peek()) is not None and (
                tok.startswith("?") or tok.upper() in ("ASC", "DESC")
            ):
                asc = True
                if tok.upper() in ("ASC", "DESC"):
                    asc = self.next().upper() == "ASC"
                    self.expect("(")
                    var = self.next()
                    self.expect(")")
                else:
                    var = self.next()
                if not var.startswith("?"):
                    raise SparqlError("ORDER BY expects variables")
                order_by.append((var[1:], asc))

        limit = None
        if self._kw("LIMIT"):
            limit = int(self.next())
        if self.peek() is not None:
            raise SparqlUnsupported(f"trailing content at {self.peek()!r}")
        return Query(select, distinct, patterns, optionals, filters, order_by, limit)

    def _triple(self) -> list[tuple[Term, Term | PathPlus, Term]]:
        """One triple, or a SPARQL 1.1 sequence path ``p1/p2/...`` desugared
        into chained patterns over fresh ``?__seqN`` join variables (never
        projected — they only co-locate the hops)."""
        s = self.term()
        segs: list[Term | PathPlus] = [self._path_segment()]
        while self.peek() == "/":
            self.next()
            segs.append(self._path_segment())
        o = self.term()
        if self.peek() == ".":
            self.next()
        out: list[tuple[Term, Term | PathPlus, Term]] = []
        cur = s
        for i, seg in enumerate(segs):
            last = i == len(segs) - 1
            nxt = o if last else Var(f"__seq{self._fresh()}")
            out.append((cur, seg, nxt))
            cur = nxt
        return out

    def _path_segment(self) -> Term | PathPlus:
        p = self.term()
        if self.peek() == "+":
            self.next()
            if not isinstance(p, Uri):
                raise SparqlUnsupported("property path on a non-URI predicate")
            return PathPlus(p)
        return p

    def _fresh(self) -> int:
        n = getattr(self, "_fresh_n", 0)
        self._fresh_n = n + 1
        return n

    def _filter(self) -> list[tuple[str, list[Term]]]:
        """FILTER ( ?v IN (t, …) [ && ?w IN (…) ]* ) — the only FILTER form
        the reference emits (browser.py:350-356, 295)."""
        self.expect("(")
        out: list[tuple[str, list[Term]]] = []
        while True:
            var = self.next()
            if not var.startswith("?"):
                raise SparqlUnsupported(f"FILTER on {var!r}: only ?var IN (...) supported")
            self.expect("IN")
            self.expect("(")
            vals: list[Term] = []
            while self.peek() != ")":
                if self.peek() == ",":
                    self.next()
                    continue
                t = self.term()
                if isinstance(t, Var):
                    raise SparqlUnsupported("variables inside IN lists")
                vals.append(t)
            self.next()
            out.append((var[1:], vals))
            if self.peek() == "&&":
                self.next()
                continue
            break
        self.expect(")")
        return out


def parse_sparql(text: str) -> Query:
    return _Parser(text).parse()


# ---------------------------------------------------------------------------
# the reference's own query text (parity data, verbatim)
# ---------------------------------------------------------------------------

_FACET_PREFIXES = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX dcat: <http://www.w3.org/ns/dcat#>
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    PREFIX dct: <http://purl.org/dc/terms/>
"""

def _facet_template(class_pname: str, pred_pname: str) -> str:
    return _FACET_PREFIXES + f"""
        SELECT ?subject ?predicate ?object
        WHERE {{
            ?subject rdf:type {class_pname} .
            ?subject {pred_pname} ?object .
        }} LIMIT 50
    """

#: The five facet-endpoint queries, verbatim semantics from
#: browser.py:167-244 (incl. the dct:LinguisticSystem capital-L quirk and
#: the publisher-type 3-hop chain that projects 3 vars instead of s/p/o).
REFERENCE_FACET_QUERIES: dict[str, str] = {
    "taxonomy": _facet_template("dcat:Catalog", "dcat:themeTaxonomy"),
    "location": _facet_template("dcat:Catalog", "dct:spatial"),
    "language": _facet_template("dcat:Catalog", "dct:LinguisticSystem"),
    "theme": _facet_template("dcat:Dataset", "dcat:theme"),
    "publisherType": _FACET_PREFIXES + """
        SELECT ?catalog ?publisher ?publisherType
        WHERE {
            ?catalog rdf:type dcat:Catalog .
            ?catalog dct:publisher ?publisher .
            ?publisher dct:type ?publisherType .
        } LIMIT 50
    """,
}

#: FilterKeys order, browser.py:247-255.
SEARCH_FILTER_KEYS = (
    "catalog", "dataset", "themeTaxonomy", "language",
    "theme", "publisher", "publisherType", "location",
)


def build_search_query(filters: dict[str, list[str]] | None, limit: int = 200) -> str:
    """Template the faceted-search SPARQL exactly as the reference does
    (browser.py:345-392, F9): whitelist the filter keys, render each as
    ``?key IN (<uri>, …)``, join with ``&&``.  ``limit=0`` omits the LIMIT
    clause (our oracle-comparable variant; the reference always sends one).
    """
    filter_items = [
        "?{} IN ({})".format(key, ", \n".join(f"<{v}>" for v in values))
        for key, values in (filters or {}).items()
        if key in SEARCH_FILTER_KEYS and values
    ]
    query_filter = " && ".join(filter_items)
    query_filter = f"FILTER ({query_filter})" if query_filter else ""
    graph_patterns = [
        "?catalog rdf:type dcat:Catalog",
        "?dataset rdf:type dcat:Dataset",
        "?catalog dcat:dataset ?dataset",
        "?catalog dcat:themeTaxonomy ?themeTaxonomy",
        "?catalog dct:LinguisticSystem ?language",
        "?dataset dcat:theme ?theme",
        "?catalog dct:publisher ?publisher",
        "?publisher dct:type ?publisherType",
        "?catalog dct:spatial ?location",
    ]
    where = "\n".join(f"{p} ." for p in graph_patterns)
    select = " ".join(f"?{k}" for k in SEARCH_FILTER_KEYS)
    lim = f"LIMIT {limit}" if limit else ""
    return _FACET_PREFIXES + f"SELECT {select}\nWHERE {{\n{where}\n{query_filter}\n}} {lim}"


def build_detail_query(dataset_uris: list[str]) -> str:
    """The 12-var detail query, verbatim from _get_datasets
    (browser.py:262-296): inner patterns for catalog/description/identifier/
    title/distribution/accessURL/mediaType/spatial/theme/language, OPTIONAL
    distribution description, FILTER restricting ?dataset to the stage-1
    URIs (the reference templates the collected list into the query text).
    """
    in_list = ", ".join(f"<{u}>" for u in dataset_uris)
    return _FACET_PREFIXES + f"""
        SELECT
            ?catalog
            ?dataset
            ?description
            ?identifier
            ?title
            ?distribution
            ?distributionURL
            ?distributionType
            ?datasetSpatial
            ?theme
            ?language
            ?distributionDescription
        WHERE {{
            ?catalog rdf:type dcat:Catalog .
            ?dataset rdf:type dcat:Dataset .
            ?catalog dcat:dataset ?dataset .
            ?dataset dct:description ?description .
            ?dataset dct:identifier ?identifier .
            ?dataset dct:title ?title .
            ?dataset dcat:distribution ?distribution .
            ?distribution dcat:accessURL ?distributionURL .
            ?distribution dcat:mediaType ?distributionType .
            ?dataset dct:spatial ?datasetSpatial .
            ?dataset dcat:theme ?theme .
            ?catalog dct:LinguisticSystem ?language .
            OPTIONAL {{ ?distribution dct:description ?distributionDescription }} .
            FILTER (?dataset IN ({in_list}))
        }}
    """


# ---------------------------------------------------------------------------
# compiler
# ---------------------------------------------------------------------------

def _path_pattern_df(
    edges: DataFrame, s: Term, p: PathPlus, o: Term
) -> tuple[DataFrame, set[str]]:
    """``?s pred+ ?o`` → the reachability closure as a 2-column pattern.

    Endpoint constants become filters on the closure (Catalyst pushes them
    below the iteration's final union); literal endpoints are impossible
    (paths traverse URI nodes only).
    """
    from ..operators.paths import reachable_pairs

    df = reachable_pairs(edges, preds=[p.pred.value]).select("src", "dst")
    cols: dict[str, str] = {}
    for term, col in ((s, "src"), (o, "dst")):
        if isinstance(term, Var):
            if term.name in cols:
                raise SparqlUnsupported(
                    "property path with the same variable at both ends"
                )
            cols[term.name] = col
        elif isinstance(term, Uri):
            df = df.filter(F.col(col) == term.value)
        else:
            raise SparqlUnsupported("literal endpoint on a property path")
    return df.select(*[F.col(src).alias(var) for var, src in cols.items()]), set(cols)


def _pattern_df(
    edges: DataFrame, pat: tuple[Term, Term | PathPlus, Term]
) -> tuple[DataFrame, set[str]]:
    """One triple pattern → a filtered, variable-named slice of edges."""
    s, p, o = pat
    if isinstance(p, PathPlus):
        return _path_pattern_df(edges, s, p, o)
    df = edges
    cols: dict[str, str] = {}  # var name -> source column

    def bind(term: Term, col: str, is_obj: bool) -> None:
        nonlocal df
        if isinstance(term, Var):
            if term.name in cols:  # same var twice in one pattern
                df = df.filter(F.col(cols[term.name]) == F.col(col))
            else:
                cols[term.name] = col
        elif isinstance(term, Uri):
            df = df.filter(F.col(col) == term.value)
            if is_obj:
                df = df.filter(F.col("obj_kind") == "uri")
        else:  # literal object
            if not is_obj:
                raise SparqlError("literal in subject/predicate position")
            df = df.filter((F.col(col) == term.lex) & (F.col("obj_kind") == "literal"))
            # RDF term equality: a simple literal, a lang-tagged literal and a
            # typed literal are three DISTINCT terms even with the same lexical
            # form, so absence of a tag must filter, not wildcard.
            df = df.filter(
                F.col("lang") == term.lang if term.lang is not None else F.col("lang").isNull()
            )
            df = df.filter(
                F.col("dtype") == term.dtype if term.dtype is not None else F.col("dtype").isNull()
            )

    bind(s, "subj", False)
    bind(p, "pred", False)
    bind(o, "obj", True)
    out = df.select(*[F.col(src).alias(var) for var, src in cols.items()])
    return out, set(cols)


def _join_group(
    edges: DataFrame, patterns: list[tuple[Term, Term, Term]]
) -> tuple[DataFrame, set[str]]:
    acc: DataFrame | None = None
    bound: set[str] = set()
    for pat in patterns:
        df, vars_ = _pattern_df(edges, pat)
        if acc is None:
            acc, bound = df, vars_
            continue
        on = sorted(bound & vars_)
        acc = acc.join(df, on) if on else acc.crossJoin(df)
        bound |= vars_
    if acc is None:
        raise SparqlError("empty graph pattern")
    return acc, bound


def _in_values(terms: list[Term]) -> list[str]:
    return [t.value if isinstance(t, Uri) else t.lex for t in terms]


def compile_sparql(edges: DataFrame, query: str | Query) -> DataFrame:
    """Compile a (parsed) SPARQL SELECT over the merged edges table.

    ``edges`` must be the merged triple SET (operators/merge.merge_triples)
    with columns (subj, pred, obj, obj_kind, lang, dtype, …) — the same
    precondition as the hand-built facet/search builders.
    """
    q = parse_sparql(query) if isinstance(query, str) else query

    acc, bound = _join_group(edges, q.patterns)
    for group in q.optionals:
        gdf, gvars = _join_group(edges, group)
        on = sorted(bound & gvars)
        if not on:
            raise SparqlUnsupported("OPTIONAL sharing no variables with the BGP")
        acc = acc.join(gdf, on, "left")
        bound |= gvars

    for var, terms in q.filters:
        if var not in bound:
            raise SparqlError(f"FILTER on unbound variable ?{var}")
        acc = acc.filter(F.col(var).isin(_in_values(terms)))

    # SPARQL unbound-projection semantics: a selected var no pattern binds
    # is NULL (the reference facet templates project a never-bound
    # ?predicate and read the object column positionally)
    proj = [
        F.col(v) if v in bound else F.lit(None).cast("string").alias(v)
        for v in q.select
    ]
    out = acc.select(*proj)
    if q.distinct:
        out = out.distinct()

    if q.order_by:
        out = out.orderBy(
            *[F.asc(v) if asc else F.desc(v) for v, asc in q.order_by]
        )
    elif q.limit is not None:
        # deterministic LIMIT: order by the bound projected vars (compiles
        # to TakeOrdered, no full sort shuffle)
        keys = [v for v in q.select if v in bound]
        if keys:
            out = out.orderBy(*keys)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out
