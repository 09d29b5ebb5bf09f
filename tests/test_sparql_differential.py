"""Differential property test: the DataFrame SPARQL evaluator versus a
naive in-memory reference evaluator on randomized tiny graphs and
query shapes (BGP join, OPTIONAL, numeric FILTER, DISTINCT).

The reference's own tests are example-based only (SURVEY §5); this adds
the property-based layer our test strategy commits to: for every
generated (graph, query) pair, the distributed plan must agree with the
obviously-correct nested-loop semantics.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st

from morph_xr2rml_spark.sparql import sparql_select

EX = "http://example.org/"
_INT = "http://www.w3.org/2001/XMLSchema#integer"
_DBL = "http://www.w3.org/2001/XMLSchema#double"


def _lit(n: int) -> str:
    return f'"{n}"^^<{_INT}>'


def _dlit(s: str) -> str:
    return f'"{s}"^^<{_DBL}>'


import re as _nre  # noqa: E402

_NUM_RE = _nre.compile(r'^"?([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)')


def _num(term: str):
    """Naive mirror of the engine's _numeric_value: prefix-parse the
    lexical numeric value (E-notation and leading-dot included), None
    for non-numeric terms."""
    if not term.startswith('"'):
        return None
    m = _NUM_RE.match(term)
    return float(m.group(1)) if m else None


# ---------------------------------------------------------------------------
# naive evaluator: solution mappings as dicts, nested-loop everything
# ---------------------------------------------------------------------------


def _match(triple, pattern, binding):
    """Try to extend binding by matching one triple against (s, p, o)."""
    b = dict(binding)
    for t, q in zip(triple, pattern):
        if q.startswith("?"):
            v = q[1:]
            if v in b:
                if b[v] != t:
                    return None
            else:
                b[v] = t
        elif t != q:
            return None
    return b


def _eval_bgp(graph, patterns, bindings):
    for pat in patterns:
        nxt = []
        for b in bindings:
            for t in graph:
                m = _match(t, pat, b)
                if m is not None:
                    nxt.append(m)
        bindings = nxt
    return bindings


def naive_select(graph, patterns, optional, filt_var, filt_min, distinct):
    sols = _eval_bgp(graph, patterns, [{}])
    if optional is not None:
        out = []
        for b in sols:
            ext = _eval_bgp(graph, [optional], [b])
            out.extend(ext if ext else [b])
        sols = out
    if filt_var is not None:
        kept = []
        for b in sols:
            v = b.get(filt_var)
            if v is None:
                continue
            n = _num(v)
            if n is not None and n >= filt_min:
                kept.append(b)
        sols = kept
    rows = [tuple(sorted(b.items())) for b in sols]
    return set(rows) if distinct else rows


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

_SUBJ = [f"<{EX}s{i}>" for i in range(4)]
_PRED = [f"<{EX}p{i}>" for i in range(3)]
# E-notation doubles included deliberately: Spark's double→string cast
# emits E-notation for |x| ≥ 1e7, and round-3 found _numeric_value
# parsing "1.0E7" as 1.0 — these literals keep that path covered in
# every FILTER / ORDER BY differential below
_OBJ = _SUBJ + [_lit(n) for n in range(4)] + [
    _dlit("1.0E7"),
    _dlit("2.5E-2"),
    _dlit(".5"),
]

triple_st = st.tuples(
    st.sampled_from(_SUBJ), st.sampled_from(_PRED), st.sampled_from(_OBJ)
)
graph_st = st.lists(triple_st, min_size=1, max_size=14, unique=True)

_VARS = ["?x", "?y", "?z"]


def pattern_st(rng=2):
    return st.tuples(
        st.sampled_from(_VARS[:rng] + _SUBJ[:2]),
        st.sampled_from(_VARS[rng : rng + 1] + _PRED),
        st.sampled_from(_VARS[:rng] + [_lit(1), _SUBJ[1]]),
    )


@settings(max_examples=12, deadline=None)
@given(
    graph=graph_st,
    p1=pattern_st(),
    p2=pattern_st(),
    use_opt=st.booleans(),
    use_filter=st.booleans(),
    fmin=st.integers(min_value=0, max_value=3),
)
def _property(spark, graph, p1, p2, use_opt, use_filter, fmin):
    patterns = [p1]
    optional = p2 if use_opt else None
    if not use_opt:
        patterns.append(p2)
    all_vars = sorted(
        {t[1:] for pat in patterns + ([optional] if optional else [])
         for t in pat if t.startswith("?")}
    )
    if not all_vars:
        return
    filt_var = None
    if use_filter:
        filt_var = all_vars[0]

    body = " . ".join(" ".join(p) for p in patterns)
    q = "SELECT DISTINCT " + " ".join(f"?{v}" for v in all_vars) + " WHERE { "
    q += body
    if optional is not None:
        q += " OPTIONAL { " + " ".join(optional) + " }"
    if filt_var is not None:
        q += f" FILTER(?{filt_var} >= {fmin})"
    q += " }"

    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = {
        tuple(sorted((k, v) for k, v in r.asDict().items() if v is not None))
        for r in sparql_select(df, q).collect()
    }
    want_rows = naive_select(graph, patterns, optional, filt_var, fmin, True)
    want = {
        tuple((k, v) for k, v in row if k in all_vars) for row in want_rows
    }
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_vs_naive(spark):
    _property(spark)


# ---------------------------------------------------------------------------
# UNION / MINUS shapes
# ---------------------------------------------------------------------------


def naive_union(graph, branch_a, branch_b):
    """Bag union of two single-pattern branches (unbound vars absent)."""
    sols = _eval_bgp(graph, [branch_a], [{}]) + _eval_bgp(
        graph, [branch_b], [{}]
    )
    return sols


def naive_minus(graph, patterns, minus_pat):
    """SPARQL 1.1 §8.3: drop a solution iff some MINUS solution shares
    at least one variable with it and agrees on every shared one."""
    sols = _eval_bgp(graph, patterns, [{}])
    removed = _eval_bgp(graph, [minus_pat], [{}])
    out = []
    for b in sols:
        compatible = any(
            (b.keys() & m.keys())
            and all(b[v] == m[v] for v in b.keys() & m.keys())
            for m in removed
        )
        if not compatible:
            out.append(b)
    return out


@settings(max_examples=10, deadline=None)
@given(graph=graph_st, pa=pattern_st(), pb=pattern_st())
def _union_property(spark, graph, pa, pb):
    vars_a = {t[1:] for t in pa if t.startswith("?")}
    vars_b = {t[1:] for t in pb if t.startswith("?")}
    all_vars = sorted(vars_a | vars_b)
    if not all_vars:
        return
    q = (
        "SELECT DISTINCT "
        + " ".join(f"?{v}" for v in all_vars)
        + " WHERE { { "
        + " ".join(pa)
        + " } UNION { "
        + " ".join(pb)
        + " } }"
    )
    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = {
        tuple(sorted((k, v) for k, v in r.asDict().items() if v is not None))
        for r in sparql_select(df, q).collect()
    }
    want = {
        tuple(sorted(b.items())) for b in naive_union(graph, pa, pb)
    }
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_union(spark):
    _union_property(spark)


@settings(max_examples=10, deadline=None)
@given(graph=graph_st, p1=pattern_st(), pm=pattern_st())
def _minus_property(spark, graph, p1, pm):
    all_vars = sorted({t[1:] for t in p1 if t.startswith("?")})
    if not all_vars:
        return
    q = (
        "SELECT DISTINCT "
        + " ".join(f"?{v}" for v in all_vars)
        + " WHERE { "
        + " ".join(p1)
        + " . MINUS { "
        + " ".join(pm)
        + " } }"
    )
    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = {
        tuple(sorted((k, v) for k, v in r.asDict().items() if v is not None))
        for r in sparql_select(df, q).collect()
    }
    want = {
        tuple(sorted(b.items())) for b in naive_minus(graph, [p1], pm)
    }
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_minus(spark):
    _minus_property(spark)


# ---------------------------------------------------------------------------
# FILTER [NOT] EXISTS shapes
# ---------------------------------------------------------------------------


def naive_exists(graph, patterns, sub_pat, positive):
    sols = _eval_bgp(graph, patterns, [{}])
    out = []
    for b in sols:
        found = bool(_eval_bgp(graph, [sub_pat], [b]))
        if found == positive:
            out.append(b)
    return out


@settings(max_examples=10, deadline=None)
@given(
    graph=graph_st,
    p1=pattern_st(),
    pe=pattern_st(),
    positive=st.booleans(),
)
def _exists_property(spark, graph, p1, pe, positive):
    all_vars = sorted({t[1:] for t in p1 if t.startswith("?")})
    if not all_vars:
        return
    kw = "EXISTS" if positive else "NOT EXISTS"
    q = (
        "SELECT DISTINCT "
        + " ".join(f"?{v}" for v in all_vars)
        + " WHERE { "
        + " ".join(p1)
        + f" . FILTER {kw} {{ "
        + " ".join(pe)
        + " } }"
    )
    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = {
        tuple(sorted((k, v) for k, v in r.asDict().items() if v is not None))
        for r in sparql_select(df, q).collect()
    }
    want = {
        tuple(sorted(b.items()))
        for b in naive_exists(graph, [p1], pe, positive)
    }
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_exists(spark):
    _exists_property(spark)


# ---------------------------------------------------------------------------
# property-path shapes (incl. the distributed transitive-closure fixpoint)
# ---------------------------------------------------------------------------


def naive_path_pairs(graph, expr):
    """expr: ('leaf', p) | ('seq', a, b) | ('inv', a) | ('alt', a, b)
    | ('plus', a) | ('star', a)."""
    kind = expr[0]
    if kind == "leaf":
        return {(s, o) for s, p, o in graph if p == expr[1]}
    if kind == "inv":
        return {(o, s) for s, o in naive_path_pairs(graph, expr[1])}
    if kind == "alt":
        return naive_path_pairs(graph, expr[1]) | naive_path_pairs(
            graph, expr[2]
        )
    if kind == "seq":
        a = naive_path_pairs(graph, expr[1])
        b = naive_path_pairs(graph, expr[2])
        return {(s, o2) for s, o1 in a for s2, o2 in b if o1 == s2}
    if kind in ("plus", "star"):
        edges = naive_path_pairs(graph, expr[1])
        closure = set(edges)
        while True:
            grown = closure | {
                (s, o2) for s, o1 in closure for s2, o2 in edges if o1 == s2
            }
            if grown == closure:
                break
            closure = grown
        if kind == "star":
            nodes = {s for s, _, _ in graph} | {o for _, _, o in graph}
            closure |= {(n, n) for n in nodes}
        return closure
    raise AssertionError(kind)


def _path_text(expr):
    kind = expr[0]
    if kind == "leaf":
        return expr[1]
    if kind == "inv":
        return "^" + _path_text(expr[1])
    if kind == "alt":
        return f"({_path_text(expr[1])}|{_path_text(expr[2])})"
    if kind == "seq":
        return f"({_path_text(expr[1])}/{_path_text(expr[2])})"
    return f"({_path_text(expr[1])}){'+' if kind == 'plus' else '*'}"


leaf_st = st.sampled_from(_PRED).map(lambda p: ("leaf", p))
path_st = st.one_of(
    leaf_st,
    st.tuples(st.just("inv"), leaf_st),
    st.tuples(st.just("alt"), leaf_st, leaf_st),
    st.tuples(st.just("seq"), leaf_st, leaf_st),
    st.tuples(st.just("plus"), leaf_st),
    st.tuples(st.just("star"), leaf_st),
)


@settings(max_examples=10, deadline=None)
@given(graph=graph_st, expr=path_st)
def _path_property(spark, graph, expr):
    q = f"SELECT DISTINCT ?x ?y WHERE {{ ?x {_path_text(expr)} ?y }}"
    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = {(r["x"], r["y"]) for r in sparql_select(df, q).collect()}
    want = naive_path_pairs(graph, expr)
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_paths(spark):
    _path_property(spark)


# ---------------------------------------------------------------------------
# GROUP BY + COUNT
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(graph=graph_st, pred=st.sampled_from(_PRED))
def _group_property(spark, graph, pred):
    q = (
        "SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x "
        + pred
        + " ?y } GROUP BY ?x"
    )
    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = {
        (r["x"], r["n"]) for r in sparql_select(df, q).collect()
    }
    counts: dict[str, int] = {}
    for s, p, o in graph:
        if p == pred:
            counts[s] = counts.get(s, 0) + 1
    want = set(counts.items())
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_group_count(spark):
    _group_property(spark)

# ---------------------------------------------------------------------------
# pattern JOIN union (solution compatibility with maybe-unbound vars)
# ---------------------------------------------------------------------------


def _compat_join(sols_a, sols_b):
    """SPARQL 1.1 §18.3 join: merge solutions compatible on shared
    BOUND vars (an unbound var is compatible with anything)."""
    out = []
    for a in sols_a:
        for b in sols_b:
            shared = a.keys() & b.keys()
            if all(a[v] == b[v] for v in shared):
                m = dict(a)
                m.update(b)
                out.append(m)
    return out


@settings(max_examples=10, deadline=None)
@given(graph=graph_st, p1=pattern_st(), pa=pattern_st(), pb=pattern_st())
def _union_join_property(spark, graph, p1, pa, pb):
    all_vars = sorted(
        {t[1:] for pat in (p1, pa, pb) for t in pat if t.startswith("?")}
    )
    if not all_vars:
        return
    q = (
        "SELECT DISTINCT "
        + " ".join(f"?{v}" for v in all_vars)
        + " WHERE { "
        + " ".join(p1)
        + " . { "
        + " ".join(pa)
        + " } UNION { "
        + " ".join(pb)
        + " } }"
    )
    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = {
        tuple(sorted((k, v) for k, v in r.asDict().items() if v is not None))
        for r in sparql_select(df, q).collect()
    }
    outer = _eval_bgp(graph, [p1], [{}])
    union = _eval_bgp(graph, [pa], [{}]) + _eval_bgp(graph, [pb], [{}])
    want = {tuple(sorted(b.items())) for b in _compat_join(outer, union)}
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_union_join(spark):
    _union_join_property(spark)


# ---------------------------------------------------------------------------
# ORDER BY value ordering over typed numeric literals
# ---------------------------------------------------------------------------


def _order_key(term: str | None):
    """Mirror of the engine's composite sort key: term-class rank per
    SPARQL 1.1 §15.1 (unbound < blank < IRI < literal), then numeric
    terms by value then lexical form; non-numeric terms first within
    their class, lexically."""
    if term is None:
        return (0, 0, 0.0, "")
    rank = 1 if term.startswith("_:") else 2 if term.startswith("<") else 3
    m = _NUM_RE.match(term)
    n = float(m.group(1)) if m and m.group(1) else None
    if n is not None:
        return (rank, 1, n, term)
    return (rank, 0, 0.0, term)


@settings(max_examples=10, deadline=None)
@given(graph=graph_st, pred=st.sampled_from(_PRED), desc=st.booleans())
def _order_property(spark, graph, pred, desc):
    d = " DESC(?y)" if desc else " ?y"
    q = f"SELECT ?y WHERE {{ ?x {pred} ?y }} ORDER BY{d}"
    df = spark.createDataFrame(
        list(graph), "subj string, pred string, obj string"
    )
    got = [r["y"] for r in sparql_select(df, q).collect()]
    want = sorted(
        (o for s, p, o in graph if p == pred), key=_order_key, reverse=desc
    )
    assert got == want, f"query: {q}\ngraph: {graph}"


def test_differential_order_by(spark):
    _order_property(spark)


# ---------------------------------------------------------------------------
# GRAPH shapes (RDF dataset semantics over a quad table)
# ---------------------------------------------------------------------------

_GRAPHS = [f"<{EX}g0>", f"<{EX}g1>"]

quad_st = st.lists(
    st.tuples(
        st.sampled_from(_SUBJ),
        st.sampled_from(_PRED),
        st.sampled_from(_OBJ),
        st.sampled_from([None] + _GRAPHS),
    ),
    min_size=1,
    max_size=14,
    unique=True,
)


def naive_graph(quads, p1, gterm, p2):
    """{ p1 . GRAPH gterm { p2 } }: p1 over the default graph, p2 over
    one named graph at a time (binding gterm when it is a variable)."""
    default = [q[:3] for q in quads if q[3] is None]
    sols = _eval_bgp(default, [p1], [{}])
    named_graphs = sorted({q[3] for q in quads if q[3] is not None})
    out = []
    for b in sols:
        for g in named_graphs:
            if gterm.startswith("?"):
                v = gterm[1:]
                if v in b and b[v] != g:
                    continue
                b2 = {**b, v: g}
            elif gterm != g:
                continue
            else:
                b2 = dict(b)
            named = [q[:3] for q in quads if q[3] == g]
            out.extend(_eval_bgp(named, [p2], [b2]))
    return out


@settings(max_examples=10, deadline=None)
@given(
    quads=quad_st,
    p1=pattern_st(),
    p2=pattern_st(),
    gterm=st.sampled_from(["?g"] + _GRAPHS),
)
def _graph_property(spark, quads, p1, p2, gterm):
    all_vars = sorted(
        {t[1:] for pat in (p1, p2) for t in pat if t.startswith("?")}
        | ({gterm[1:]} if gterm.startswith("?") else set())
    )
    if not all_vars:
        return
    q = (
        "SELECT DISTINCT "
        + " ".join(f"?{v}" for v in all_vars)
        + " WHERE { "
        + " ".join(p1)
        + f" . GRAPH {gterm} {{ "
        + " ".join(p2)
        + " } }"
    )
    df = spark.createDataFrame(
        list(quads), "subj string, pred string, obj string, graph string"
    )
    got = {
        tuple(sorted((k, v) for k, v in r.asDict().items() if v is not None))
        for r in sparql_select(df, q).collect()
    }
    want = {
        tuple(sorted(b.items()))
        for b in naive_graph(quads, p1, gterm, p2)
    }
    assert got == want, f"query: {q}\nquads: {quads}"


def test_differential_graph(spark):
    _graph_property(spark)


def naive_dataset(quads, from_graphs, from_named):
    """SPARQL 1.1 §13.2 over the quad store: default graph = set union
    of the FROM graphs, named graphs = exactly the FROM NAMED ones."""
    default = {q[:3] for q in quads if q[3] in from_graphs}
    out = [(s, p, o, None) for s, p, o in sorted(default)]
    out += [q for q in quads if q[3] is not None and q[3] in from_named]
    return out


@settings(max_examples=10, deadline=None)
@given(
    quads=quad_st,
    p1=pattern_st(),
    p2=pattern_st(),
    gterm=st.sampled_from(["?g"] + _GRAPHS),
    # at least one clause is always present (the no-clause case is the
    # plain GRAPH differential above); named-only is covered by the
    # example-based test_dataset_clauses
    from_graphs=st.sets(st.sampled_from(_GRAPHS), min_size=1, max_size=2),
    from_named=st.sets(st.sampled_from(_GRAPHS), max_size=2),
)
def _dataset_property(spark, quads, p1, p2, gterm, from_graphs, from_named):
    all_vars = sorted(
        {t[1:] for pat in (p1, p2) for t in pat if t.startswith("?")}
        | ({gterm[1:]} if gterm.startswith("?") else set())
    )
    if not all_vars:
        return
    clauses = " ".join(f"FROM {g}" for g in sorted(from_graphs))
    clauses += " " + " ".join(f"FROM NAMED {g}" for g in sorted(from_named))
    q = (
        "SELECT DISTINCT "
        + " ".join(f"?{v}" for v in all_vars)
        + f" {clauses} WHERE {{ "
        + " ".join(p1)
        + f" . GRAPH {gterm} {{ "
        + " ".join(p2)
        + " } }"
    )
    df = spark.createDataFrame(
        list(quads), "subj string, pred string, obj string, graph string"
    )
    got = {
        tuple(sorted((k, v) for k, v in r.asDict().items() if v is not None))
        for r in sparql_select(df, q).collect()
    }
    want = {
        tuple(sorted(b.items()))
        for b in naive_graph(
            naive_dataset(quads, from_graphs, from_named), p1, gterm, p2
        )
    }
    assert got == want, f"query: {q}\nquads: {quads}"


def test_differential_dataset_clauses(spark):
    _dataset_property(spark)


# ---------------------------------------------------------------------------
# value-function layer: STRBEFORE/STRAFTER/REPLACE/ENCODE_FOR_URI,
# ABS/CEIL/FLOOR/ROUND, MD5, date accessors, and (expr AS ?alias)
# projections — engine vs independent Python mirrors of the SPARQL 1.1
# definitions (§17.4 / XPath F&O), applied to randomized mixed terms
# ---------------------------------------------------------------------------

import hashlib as _hashlib  # noqa: E402
import math as _math  # noqa: E402
import urllib.parse as _urlparse  # noqa: E402

_DT_MIRROR_RE = _nre.compile(
    r"^(-?\d{4,})-(\d{2})-(\d{2})"
    r"(?:T(\d{2}):(\d{2}):(\d{2}(?:\.\d+)?))?"
    r"(Z|[+-]\d{2}:\d{2})?$"
)


def _mirror_lex(term: str) -> str:
    """STR(): lexical form (generator alphabet has no escapes)."""
    if term.startswith('"'):
        return term[1 : term.rindex('"')]
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    return term


def _spec_strbefore(a: str, b: str) -> str:
    if b == "":
        return ""
    return a.split(b, 1)[0] if b in a else ""


def _spec_strafter(a: str, b: str) -> str:
    if b == "":
        return a
    return a.split(b, 1)[1] if b in a else ""


def _spec_round(x: float | None) -> float | None:
    return None if x is None else float(_math.floor(x + 0.5))


_VALUE_TERM_ST = st.one_of(
    st.text(alphabet="abxy -09é.", max_size=8).map(lambda s: f'"{s}"'),
    st.integers(-5, 30).map(_lit),
    # quarters: exact in IEEE double, and .5 halves exercise the
    # fn:round tie rule
    st.integers(-40, 40).map(
        lambda n: f'"{n / 4}"^^<http://www.w3.org/2001/XMLSchema#decimal>'
    ),
    st.sampled_from(
        [
            '"2021-03-05T14:30:07.25+02:00"'
            "^^<http://www.w3.org/2001/XMLSchema#dateTime>",
            '"2020-12-31"^^<http://www.w3.org/2001/XMLSchema#date>',
            '"1999-01-02T03:04:05Z"'
            "^^<http://www.w3.org/2001/XMLSchema#dateTime>",
        ]
    ),
    st.sampled_from([f"<{EX}iri/1>", f"<{EX}iri/two>"]),
)


@settings(max_examples=12, deadline=None)
@given(
    terms=st.lists(_VALUE_TERM_ST, min_size=1, max_size=6),
    sep=st.sampled_from(["-", "a", " ", "", "xy", "0"]),
    pat=st.sampled_from(["a", "[0-9]", "x.", " "]),
    rep=st.sampled_from(["_", "", "Z"]),
)
def _value_fn_property(spark, terms, sep, pat, rep):
    graph = [(f"<{EX}s/{i}>", f"<{EX}v>", t) for i, t in enumerate(terms)]
    df = spark.createDataFrame(
        graph, "subj string, pred string, obj string"
    )
    q = f"""SELECT ?s
        (STRBEFORE(STR(?v), "{sep}") AS ?sb)
        (STRAFTER(STR(?v), "{sep}") AS ?sa)
        (REPLACE(STR(?v), "{pat}", "{rep}") AS ?rp)
        (ENCODE_FOR_URI(STR(?v)) AS ?enc)
        (MD5(STR(?v)) AS ?md)
        (ABS(?v) AS ?ab) (CEIL(?v) AS ?ce) (FLOOR(?v) AS ?fl)
        (ROUND(?v) AS ?ro)
        (YEAR(?v) AS ?yr) (SECONDS(?v) AS ?sec) (TZ(?v) AS ?tz)
        (?v * 2 + 1 AS ?ar)
        WHERE {{ ?s <{EX}v> ?v }}"""
    got = {r["s"]: r.asDict() for r in sparql_select(df, q).collect()}
    assert len(got) == len(graph)
    for i, t in enumerate(terms):
        lex = _mirror_lex(t)
        num = _num(t) if t.startswith('"') else None
        mdt = _DT_MIRROR_RE.match(lex) if t.startswith('"') else None
        r = got[f"<{EX}s/{i}>"]
        ctx = f"term={t!r} sep={sep!r} pat={pat!r} rep={rep!r} row={r}"
        assert r["sb"] == _spec_strbefore(lex, sep), ctx
        assert r["sa"] == _spec_strafter(lex, sep), ctx
        assert r["rp"] == _nre.sub(pat, rep, lex), ctx
        assert r["enc"] == _urlparse.quote(lex, safe=""), ctx
        assert r["md"] == _hashlib.md5(lex.encode()).hexdigest(), ctx
        if num is None:
            assert (
                r["ab"] is None and r["ce"] is None
                and r["fl"] is None and r["ro"] is None and r["ar"] is None
            ), ctx
        else:
            assert r["ab"] == abs(num), ctx
            assert r["ce"] == float(_math.ceil(num)), ctx
            assert r["fl"] == float(_math.floor(num)), ctx
            assert r["ro"] == _spec_round(num), ctx
            assert r["ar"] == num * 2 + 1, ctx
        if mdt is None:
            assert r["yr"] is None and r["sec"] is None, ctx
        else:
            assert r["yr"] == float(mdt.group(1)), ctx
            assert r["sec"] == (
                float(mdt.group(6)) if mdt.group(6) else None
            ), ctx
            assert r["tz"] == (mdt.group(7) or ""), ctx


def test_differential_value_functions(spark):
    _value_fn_property(spark)


# ---------------------------------------------------------------------------
# grouped aggregates over expressions + GROUP BY expression keys
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(st.integers(-6, 24), min_size=1, max_size=10),
    div=st.sampled_from([2, 3, 4]),
    mul=st.integers(-3, 3),
)
def _agg_expr_property(spark, vals, div, mul):
    graph = [
        (f"<{EX}r/{i}>", f"<{EX}v>", _lit(v)) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        graph, "subj string, pred string, obj string"
    )
    q = f"""SELECT ?b (SUM(?v * {mul} + 1) AS ?s) (MAX(?v * ?v) AS ?m)
            (COUNT(?v) AS ?n)
        WHERE {{ ?r <{EX}v> ?v }} GROUP BY (FLOOR(?v / {div}) AS ?b)"""
    got = {
        r["b"]: (r["s"], r["m"], r["n"])
        for r in sparql_select(df, q).collect()
    }
    import math as _m

    want: dict[float, list[int]] = {}
    for v in vals:
        want.setdefault(float(_m.floor(v / div)), []).append(v)
    assert got.keys() == want.keys(), q
    for b, vs in want.items():
        s, m, n = got[b]
        assert s == float(sum(v * mul + 1 for v in vs)), (q, b, vs)
        assert m == float(max(v * v for v in vs)), (q, b, vs)
        assert n == len(vs), (q, b, vs)


def test_differential_agg_over_expression(spark):
    _agg_expr_property(spark)
