"""Seeded fuzz: random queries in the supported SPARQL subset, rendered to
text, through tokenizer → parser → compiler → Spark execution, checked
against an INDEPENDENT naive evaluator (nested-loop binding extension over a
Python list of triples — no DataFrames, no shared code with the compiler).

The golden/builder-equality tests in test_sparql.py pin the reference's own
templates; this test hammers the compiler's corners — cross joins (patterns
sharing no variable), repeated variables inside one pattern, OPTIONAL
groups, IN filters hitting optional-bound (nullable) variables, unbound
projected variables, literal term equality (lang/dtype distinguish terms).
"""

import random

from breg_dcat_harvester_spark.plans import sparql as sp

# --- tiny vocabulary: small enough that joins actually match ---------------
SUBJ = ["http://x.org/s0", "http://x.org/s1", "http://x.org/s2"]
PRED = ["http://x.org/p0", "http://x.org/p1", "http://x.org/p2"]
OBJ_URI = ["http://x.org/s0", "http://x.org/o0", "http://x.org/o1"]
# same lexical form under different lang/dtype = three DISTINCT RDF terms
OBJ_LIT = [
    ("v", None, None),
    ("v", "en", None),
    ("v", None, "http://www.w3.org/2001/XMLSchema#string"),
    ("w x", None, None),
]
VARS = ["a", "b", "c", "d"]


def gen_edges(rng: random.Random) -> list[dict]:
    seen, edges = set(), []
    for _ in range(rng.randint(12, 28)):
        s = rng.choice(SUBJ)
        p = rng.choice(PRED)
        if rng.random() < 0.5:
            o, kind, lang, dtype = rng.choice(OBJ_URI), "uri", None, None
        else:
            lex, lang, dtype = rng.choice(OBJ_LIT)
            o, kind = lex, "literal"
        key = (s, p, o, kind, lang, dtype)
        if key in seen:  # merged edges table is a SET
            continue
        seen.add(key)
        edges.append(
            dict(subj=s, pred=p, obj=o, obj_kind=kind, lang=lang, dtype=dtype)
        )
    return edges


def gen_term(rng: random.Random, pos: str, var_bias: float):
    if rng.random() < var_bias:
        return sp.Var(rng.choice(VARS))
    if pos == "subj":
        return sp.Uri(rng.choice(SUBJ))
    if pos == "pred":
        return sp.Uri(rng.choice(PRED))
    if rng.random() < 0.5:
        return sp.Uri(rng.choice(OBJ_URI))
    return sp.Lit(*rng.choice(OBJ_LIT))


def gen_query(rng: random.Random) -> sp.Query:
    patterns = [
        (
            gen_term(rng, "subj", 0.7),
            gen_term(rng, "pred", 0.4),
            gen_term(rng, "obj", 0.7),
        )
        for _ in range(rng.randint(1, 3))
    ]
    bound = {t.name for p in patterns for t in p if isinstance(t, sp.Var)}

    optionals = []
    if bound and rng.random() < 0.6:
        share = sp.Var(rng.choice(sorted(bound)))
        group = [(share, gen_term(rng, "pred", 0.3), gen_term(rng, "obj", 0.7))]
        if rng.random() < 0.4:
            group.append(
                (
                    gen_term(rng, "subj", 0.8),
                    gen_term(rng, "pred", 0.3),
                    gen_term(rng, "obj", 0.8),
                )
            )
            gvars = {t.name for p in group for t in p if isinstance(t, sp.Var)}
            if not (gvars & bound):  # compiler rejects unshared OPTIONAL
                group[1] = (share, group[1][1], group[1][2])
        optionals.append(group)
        bound |= {t.name for p in group for t in p if isinstance(t, sp.Var)}

    filters = []
    if bound and rng.random() < 0.5:
        values = [sp.Uri(u) for u in rng.sample(SUBJ + OBJ_URI, rng.randint(1, 3))]
        if rng.random() < 0.3:
            values.append(sp.Lit(rng.choice(OBJ_LIT)[0]))
        filters.append((rng.choice(sorted(bound)), values))

    select = sorted(bound) or ["a"]
    if rng.random() < 0.2:
        select = select + ["zz"]  # projected but never bound -> NULL column
    return sp.Query(
        select=select,
        distinct=rng.random() < 0.5,
        patterns=patterns,
        optionals=optionals,
        filters=filters,
        order_by=[],
        limit=None,
    )


# --- render the Query back to SPARQL text (exercises the parser) ----------
def render_term(t) -> str:
    if isinstance(t, sp.Var):
        return f"?{t.name}"
    if isinstance(t, sp.Uri):
        return f"<{t.value}>"
    out = '"' + t.lex + '"'
    if t.lang:
        out += f"@{t.lang}"
    elif t.dtype:
        out += f"^^<{t.dtype}>"
    return out


def render_query(q: sp.Query) -> str:
    lines = [" ".join(render_term(t) for t in p) + " ." for p in q.patterns]
    for group in q.optionals:
        inner = " . ".join(" ".join(render_term(t) for t in p) for p in group)
        lines.append("OPTIONAL { " + inner + " } .")
    for var, terms in q.filters:
        lines.append(
            f"FILTER (?{var} IN ("
            + ", ".join(render_term(t) for t in terms)
            + "))"
        )
    sel = " ".join(f"?{v}" for v in q.select)
    head = "SELECT DISTINCT" if q.distinct else "SELECT"
    return f"{head} {sel} WHERE {{\n" + "\n".join(lines) + "\n}"


# --- independent naive evaluator ------------------------------------------
def match_pattern(edges, pat, binding):
    s, p, o = pat
    out = []
    for e in edges:
        b = dict(binding)
        ok = True
        for term, col, is_obj in ((s, "subj", False), (p, "pred", False), (o, "obj", True)):
            v = e[col]
            if isinstance(term, sp.Var):
                if term.name in b:
                    if b[term.name] != v:
                        ok = False
                        break
                else:
                    b[term.name] = v
            elif isinstance(term, sp.Uri):
                if v != term.value or (is_obj and e["obj_kind"] != "uri"):
                    ok = False
                    break
            else:
                if not (
                    is_obj
                    and e["obj_kind"] == "literal"
                    and v == term.lex
                    and e["lang"] == term.lang
                    and e["dtype"] == term.dtype
                ):
                    ok = False
                    break
        if ok:
            out.append(b)
    return out


def eval_group(edges, patterns):
    sols = [{}]
    for pat in patterns:
        sols = [b for s in sols for b in match_pattern(edges, pat, s)]
    return sols


def eval_naive(edges, q: sp.Query):
    sols = eval_group(edges, q.patterns)
    bound = {t.name for p in q.patterns for t in p if isinstance(t, sp.Var)}
    for group in q.optionals:
        gsols = eval_group(edges, group)
        gvars = {t.name for p in group for t in p if isinstance(t, sp.Var)}
        shared = sorted(bound & gvars)
        nxt = []
        for r in sols:
            ms = [g for g in gsols if all(g.get(v) == r.get(v) for v in shared)]
            if ms:
                nxt.extend({**r, **g} for g in ms)
            else:
                nxt.append({**{v: None for v in gvars}, **r})
        sols = nxt
        bound |= gvars
    for var, terms in q.filters:
        vals = set(sp._in_values(terms))
        sols = [s for s in sols if s.get(var) is not None and s[var] in vals]
    rows = [tuple(s.get(v) for v in q.select) for s in sols]
    if q.distinct:
        rows = list(set(rows))
    return rows


EDGES_SCHEMA = "subj string, pred string, obj string, obj_kind string, lang string, dtype string"


def test_fuzz_compiler_vs_naive(spark):
    rng = random.Random(20260817)
    n_nonempty = 0
    for case in range(60):
        edges = gen_edges(rng)
        df = spark.createDataFrame(
            [tuple(e.values()) for e in edges], schema=EDGES_SCHEMA
        )
        for _ in range(3):
            q = gen_query(rng)
            text = render_query(q)
            parsed = sp.parse_sparql(text)
            got = sorted(
                tuple(r) for r in sp.compile_sparql(df, parsed).collect()
            )
            want = sorted(eval_naive(edges, q))
            assert got == want, f"case {case}:\n{text}\nspark={got}\nnaive={want}"
            n_nonempty += bool(want)
        if case >= 19 and n_nonempty >= 25:
            break  # enough signal; keep the suite fast
    assert n_nonempty >= 25  # the generator must actually produce matches


# ===========================================================================
# extended-construct fuzz: UNION / MINUS / VALUES / path alternation+inverse
# / extended FILTERs, against the same style of naive evaluator
# ===========================================================================

import re as _re


def gen_alt_pred(rng: random.Random) -> sp.PathAlt:
    steps = tuple(
        sp.PathStep(sp.Uri(rng.choice(PRED)), inverse=rng.random() < 0.4)
        for _ in range(rng.randint(1, 3))
    )
    return sp.PathAlt(steps)


def gen_query_ext(rng: random.Random) -> sp.Query:
    patterns = []
    for _ in range(rng.randint(1, 2)):
        s = gen_term(rng, "subj", 0.8)
        o = gen_term(rng, "obj", 0.8)
        p = gen_alt_pred(rng) if rng.random() < 0.4 else gen_term(rng, "pred", 0.2)
        if (
            isinstance(p, sp.PathAlt)
            and any(st.inverse for st in p.steps)
            and isinstance(o, sp.Lit)
        ):
            # an inverse step puts ?o in subject position, where a literal
            # is a (correctly) refused shape — keep the fuzz in-subset
            o = sp.Var(rng.choice(VARS))
        patterns.append((s, p, o))
    bound = {
        t.name
        for p in patterns
        for t in (p[0], p[2]) + ((p[1],) if isinstance(p[1], sp.Var) else ())
        if isinstance(t, sp.Var)
    }

    unions = []
    if rng.random() < 0.6:
        va, vb = rng.sample(VARS, 2)
        branches = [
            [(sp.Var(va), sp.Uri(rng.choice(PRED)), sp.Var(vb))]
            for _ in range(rng.randint(2, 3))
        ]
        unions.append(branches)
        bound |= {va, vb}

    values_blocks = []
    if bound and rng.random() < 0.4:
        var = rng.choice(sorted(bound))
        vals = rng.sample(SUBJ + OBJ_URI, rng.randint(1, 3))
        values_blocks.append(([var], [[v] for v in vals]))

    minus = []
    if bound and rng.random() < 0.5:
        share = sp.Var(rng.choice(sorted(bound)))
        minus.append(
            [(share, sp.Uri(rng.choice(PRED)), gen_term(rng, "obj", 0.6))]
        )

    filter_exprs = []
    if bound and rng.random() < 0.5:
        var = rng.choice(sorted(bound))
        kind = rng.choice(["cmp", "regex", "strstarts", "contains"])
        if kind == "cmp":
            filter_exprs.append(
                ("cmp", var, rng.choice(["=", "!="]), rng.choice(SUBJ + OBJ_URI + ["v"]))
            )
        elif kind == "regex":
            filter_exprs.append(
                ("regex", var, rng.choice(["^v", "o[01]", "s[02]", "^W"]),
                 rng.choice(["", "i"]))
            )
        elif kind == "strstarts":
            filter_exprs.append(("strstarts", var, rng.choice(["http://x.org/", "v", "w"])))
        else:
            filter_exprs.append(("contains", var, rng.choice(["s0", "o", " x"])))

    select = sorted(bound) or ["a"]
    return sp.Query(
        select=select,
        distinct=rng.random() < 0.4,
        patterns=patterns,
        optionals=[],
        filters=[],
        order_by=[],
        limit=None,
        unions=unions,
        filter_exprs=filter_exprs,
        minus=minus,
        values_blocks=values_blocks,
    )


def render_pred(p) -> str:
    if isinstance(p, sp.PathAlt):
        return "|".join(
            ("^" if st.inverse else "") + f"<{st.pred.value}>" for st in p.steps
        )
    return render_term(p)


def render_query_ext(q: sp.Query) -> str:
    lines = [
        f"{render_term(s)} {render_pred(p)} {render_term(o)} ."
        for (s, p, o) in q.patterns
    ]
    for branches in q.unions:
        parts = [
            "{ " + " . ".join(
                " ".join(render_term(t) for t in pat) for pat in br
            ) + " }"
            for br in branches
        ]
        lines.append(" UNION ".join(parts))
    for vars_, rows in q.values_blocks:
        data = " ".join(f"<{r[0]}>" if r[0].startswith("http") else f'"{r[0]}"' for r in rows)
        lines.append(f"VALUES ?{vars_[0]} {{ {data} }}")
    for group in q.minus:
        inner = " . ".join(" ".join(render_term(t) for t in pat) for pat in group)
        lines.append("MINUS { " + inner + " }")
    for expr in q.filter_exprs:
        if expr[0] == "cmp":
            _, var, op, val = expr
            rv = f"<{val}>" if val.startswith("http") else f'"{val}"'
            lines.append(f"FILTER (?{var} {op} {rv})")
        elif expr[0] == "regex":
            _, var, pat, flags = expr
            f = f', "{flags}"' if flags else ""
            lines.append(f'FILTER regex(?{var}, "{pat}"{f})')
        elif expr[0] == "strstarts":
            lines.append(f'FILTER STRSTARTS(?{expr[1]}, "{expr[2]}")')
        else:
            lines.append(f'FILTER CONTAINS(?{expr[1]}, "{expr[2]}")')
    sel = " ".join(f"?{v}" for v in q.select)
    head = "SELECT DISTINCT" if q.distinct else "SELECT"
    return f"{head} {sel} WHERE {{\n" + "\n".join(lines) + "\n}"


def match_pattern_ext(edges, pat, binding):
    s, p, o = pat
    if isinstance(p, sp.PathAlt):
        out = []
        for st in p.steps:
            bp = (
                (s, sp.Uri(st.pred.value), o)
                if not st.inverse
                else (o, sp.Uri(st.pred.value), s)
            )
            out.extend(match_pattern(edges, bp, binding))
        return out
    return match_pattern(edges, pat, binding)


def eval_group_ext(edges, patterns):
    sols = [{}]
    for pat in patterns:
        sols = [b for s in sols for b in match_pattern_ext(edges, pat, s)]
    return sols


def eval_naive_ext(edges, q: sp.Query):
    sols = eval_group_ext(edges, q.patterns) if q.patterns else None
    bound = set()
    for p in q.patterns:
        for t in (p[0], p[2]) + ((p[1],) if isinstance(p[1], sp.Var) else ()):
            if isinstance(t, sp.Var):
                bound.add(t.name)
    for branches in q.unions:
        bsols = [b for br in branches for b in eval_group_ext(edges, br)]
        bvars = {
            t.name for br in branches for p in br for t in p
            if isinstance(t, sp.Var)
        }
        if sols is None:
            sols, bound = bsols, bvars
        else:
            shared = sorted(bound & bvars)
            sols = [
                {**r, **g}
                for r in sols
                for g in bsols
                if all(g.get(v) == r.get(v) for v in shared)
            ]
            bound |= bvars
    for vars_, rows in q.values_blocks:
        var, vals = vars_[0], {r[0] for r in rows}
        sols = [s for s in sols if s.get(var) in vals]
    for group in q.minus:
        gsols = eval_group_ext(edges, group)
        gvars = {t.name for p in group for t in p if isinstance(t, sp.Var)}
        shared = sorted(bound & gvars)
        if not shared:
            continue
        sols = [
            r for r in sols
            if not any(all(g.get(v) == r.get(v) for v in shared) for g in gsols)
        ]
    for expr in q.filter_exprs:
        kind, var = expr[0], expr[1]
        def keep(s, expr=expr, kind=kind, var=var):
            v = s.get(var)
            if v is None:
                return False
            if kind == "cmp":
                return v == expr[3] if expr[2] == "=" else v != expr[3]
            if kind == "regex":
                flags = _re.I if "i" in expr[3] else 0
                return _re.search(expr[2], v, flags) is not None
            if kind == "strstarts":
                return v.startswith(expr[2])
            return expr[2] in v
        sols = [s for s in sols if keep(s)]
    rows = [tuple(s.get(v) for v in q.select) for s in sols]
    if q.distinct:
        rows = list(set(rows))
    return rows


def test_fuzz_extended_constructs(spark):
    rng = random.Random(20260819)
    n_nonempty = 0
    for case in range(60):
        edges = gen_edges(rng)
        df = spark.createDataFrame(
            [tuple(e.values()) for e in edges], schema=EDGES_SCHEMA
        )
        for _ in range(3):
            q = gen_query_ext(rng)
            text = render_query_ext(q)
            parsed = sp.parse_sparql(text)
            got = sorted(
                tuple(r) for r in sp.compile_sparql(df, parsed).collect()
            )
            want = sorted(eval_naive_ext(edges, q))
            assert got == want, f"case {case}:\n{text}\nspark={got}\nnaive={want}"
            n_nonempty += bool(want)
        if case >= 19 and n_nonempty >= 25:
            break
    assert n_nonempty >= 25


# ===========================================================================
# FILTER ||/&& boolean-tree fuzz: random nested disjunction/conjunction
# trees of supported atoms over (possibly OPTIONAL-unbound) variables,
# rendered to query text and checked against a naive evaluator implementing
# SPARQL's three-valued error logic (error||true = true, error||false =
# error; dually for &&) — the semantics the compiler maps onto Spark NULLs.
# ===========================================================================


def gen_filter_atom(rng: random.Random, vars_pool: list[str]):
    v = rng.choice(vars_pool)
    kind = rng.randrange(5)
    if kind == 0:
        return ("strstarts", v, rng.choice(["h", "v", "w", "http://x.org/s"]))
    if kind == 1:
        return ("contains", v, rng.choice(["x.org", "v", " ", "o0"]))
    if kind == 2:
        return ("strlen", v, rng.choice(["<", "<=", ">", ">="]), rng.randint(1, 20))
    if kind == 3:
        return ("regex", v, rng.choice(["^h", "v", "[sw]", "o[01]$"]))
    return ("cmp", v, rng.choice(["=", "!="]), rng.choice(["v", "w x", "http://x.org/o0"]))


def gen_bool_tree(rng: random.Random, vars_pool: list[str], depth: int = 0):
    if depth >= 2 or rng.random() < 0.45:
        return gen_filter_atom(rng, vars_pool)
    op = rng.choice(["or", "and"])
    n = rng.randint(2, 3)
    return (op, tuple(gen_bool_tree(rng, vars_pool, depth + 1) for _ in range(n)))


def render_bool(node) -> str:
    k = node[0]
    if k in ("or", "and"):
        sep = " || " if k == "or" else " && "
        return "(" + sep.join(render_bool(c) for c in node[1]) + ")"
    if k == "strstarts":
        return f'STRSTARTS(?{node[1]}, "{node[2]}")'
    if k == "contains":
        return f'CONTAINS(?{node[1]}, "{node[2]}")'
    if k == "strlen":
        return f"STRLEN(?{node[1]}) {node[2]} {node[3]}"
    if k == "regex":
        return f'regex(?{node[1]}, "{node[2]}")'
    _, v, op, val = node
    if val.startswith("http://"):
        return f"?{v} {op} <{val}>"
    return f'?{v} {op} "{val}"'


def eval_bool(node, s):
    """SPARQL three-valued logic; None = type error / unbound."""
    k = node[0]
    if k in ("or", "and"):
        vals = [eval_bool(c, s) for c in node[1]]
        if k == "or":
            if any(v is True for v in vals):
                return True
            return None if any(v is None for v in vals) else False
        if any(v is False for v in vals):
            return False
        return None if any(v is None for v in vals) else True
    v = s.get(node[1])
    if v is None:
        return None
    if k == "strstarts":
        return v.startswith(node[2])
    if k == "contains":
        return node[2] in v
    if k == "strlen":
        import operator as _op

        ops = {"<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}
        return ops[node[2]](len(v), node[3])
    if k == "regex":
        return _re.search(node[2], v) is not None
    _, _, op, val = node
    return (v == val) if op == "=" else (v != val)


def test_fuzz_filter_bool_trees(spark):
    rng = random.Random(20260820)
    n_nonempty = n_mixed = 0
    for case in range(120):
        edges = gen_edges(rng)
        df = spark.createDataFrame(
            [tuple(e.values()) for e in edges], schema=EDGES_SCHEMA
        )
        q = gen_query(rng)
        q = sp.Query(  # strip IN filters: this section fuzzes the trees
            select=q.select if q.select[-1] != "zz" else q.select[:-1],
            distinct=q.distinct,
            patterns=q.patterns,
            optionals=q.optionals,
            filters=[],
            order_by=[],
            limit=None,
        )
        bound = sorted(
            {t.name for p in q.patterns for t in p if isinstance(t, sp.Var)}
            | {
                t.name
                for g in q.optionals
                for p in g
                for t in p
                if isinstance(t, sp.Var)
            }
        )
        if not bound:
            continue
        tree = gen_bool_tree(rng, bound)
        text = render_query(q).replace(
            "\n}", f"\nFILTER {render_bool(tree)}\n}}"
        )

        def _nskey(t):  # None-safe row ordering (OPTIONAL-unbound columns)
            return tuple((x is None, x or "") for x in t)

        got = sorted(
            (tuple(r) for r in sp.compile_sparql(df, text).collect()),
            key=_nskey,
        )
        base = eval_naive(edges, q)
        # replay: eval_naive returns projected tuples; we need bindings, so
        # recompute solutions and filter with the tree
        sols = eval_group(edges, q.patterns)
        bound_set = {
            t.name for p in q.patterns for t in p if isinstance(t, sp.Var)
        }
        for group in q.optionals:
            gsols = eval_group(edges, group)
            gvars = {
                t.name for p in group for t in p if isinstance(t, sp.Var)
            }
            shared = sorted(bound_set & gvars)
            nxt = []
            for r in sols:
                ms = [
                    g
                    for g in gsols
                    if all(g.get(v) == r.get(v) for v in shared)
                ]
                if ms:
                    nxt.extend({**r, **g} for g in ms)
                else:
                    nxt.append({**{v: None for v in gvars}, **r})
            sols = nxt
            bound_set |= gvars
        kept = [s for s in sols if eval_bool(tree, s) is True]
        want = [tuple(s.get(v) for v in q.select) for s in kept]
        if q.distinct:
            want = list(set(want))
        want = sorted(want, key=_nskey)
        assert got == want, (
            f"case {case}:\n{text}\nspark={got}\nnaive={want}"
        )
        n_nonempty += bool(want)
        n_mixed += bool(want) and len(want) < len(sols)
        if case >= 39 and n_nonempty >= 20 and n_mixed >= 5:
            break
    assert n_nonempty >= 20 and n_mixed >= 5
