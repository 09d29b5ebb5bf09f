"""Late SPARQL evaluation over a *virtual* mapped graph — answering a
SPARQL query directly against the mapped sources, without first
materializing the full triple set.

This is the Spark-first re-expression of the reference's SPARQL
query-rewriting mode (its second entry point):

- ``MorphBaseRunner.runQuery`` (MorphBaseRunner.scala:57-107) drives
  rewriting instead of materialization;
- ``MorphBaseTriplePatternBinder.bindm``:50-213 / ``bindmTP``:223-249
  bind each triple pattern to the triples maps that could produce
  matching triples (template/constant compatibility)  →  here
  :func:`bind_patterns` / :func:`_tm_binding`;
- ``genCond`` / ``genCondParent`` (MorphBaseQueryTranslator.scala:227-355)
  turn the pattern's constant terms into conditions on the source query
  →  here constant subjects/objects invert the term-map template
  (``getTemplateMatching``, TemplateUtility.scala:36-69 analogue) into
  a Catalyst filter applied to the source scan *before* term
  construction, so the reduction happens at the scan;
- ``excludeTriplesAboutCollecOrContainer``
  (MorphMongoQueryTranslator.scala:270-378)  →  collection/container
  branches only bind patterns whose predicate is the POM's own or in
  the RDF vocabulary namespace;
- ``MorphMongoQueryProcessor.process``:45-150 materializes only the
  bound fragments into a temporary Jena graph and re-evaluates the
  original SPARQL on it with ARQ  →  here the bound branches union into
  a *reduced, distributed* triple frame and the existing evaluator
  (:func:`..sparql.bgp.sparql_select`) runs over it.

The binder is a **reducer, never an oracle**: a triples-map branch is
skipped only when it *provably* cannot produce a matching triple
(constant mismatch, template that cannot match the pattern's IRI,
term-type clash). Anything uncertain stays in, and per-pattern residual
equality filters plus the evaluator's own pattern matching guarantee
exactness — so virtual answers are always identical to
materialize-then-query answers, just computed over a fraction of the
data. Property paths that can have zero length (``*``/``?``) or negated
property sets disable predicate pruning for their pattern (a zero-length
path ranges over every graph node, so the whole graph is that pattern's
domain).
"""

from __future__ import annotations

import re
from dataclasses import replace

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compiler.compile import CompileOptions, MappingCompiler
from ..functions import terms
from ..functions.paths import MixedSyntaxPath
from ..functions.templates import get_template_groups, get_template_matching
from ..compiler.udfs import rewrite_mongo_id
from ..functions.paths import _jp_tokenize
from ..plans import caching
from ..mapping.model import (
    COLUMN,
    CONSTANT,
    REFERENCE,
    TEMPLATE,
    MappingDocument,
    PredicateObjectMap,
    TriplesMap,
)
from ..sources.catalog import _MONGO_FIND_RE, SourceCatalog
from .bgp import (
    Group,
    Path,
    SelectQuery,
    TriplePattern,
    _is_var,
    parse_sparql,
    sparql_construct,
    sparql_describe_where,
    sparql_select,
)
from .results import parse_term

_RDF_TYPE = f"<{terms.RDF_TYPE}>"

# characters on which every encoding chain (encode_uri + encode_url,
# functions/encoding.py) is the identity — pushdown and template-match
# exclusion are only trusted when the text involved stays inside this set
_ENCODING_INVARIANT = re.compile(r"^[A-Za-z0-9_.~\-:/#?&=@%]*$")
_UNRESERVED = re.compile(r"^[A-Za-z0-9_.~\-]*$")


# ---------------------------------------------------------------------------
# pattern collection
# ---------------------------------------------------------------------------


def collect_patterns(group: Group) -> list[TriplePattern]:
    """Every triple pattern reachable in a group tree (bindm walks the
    whole algebra the same way, MorphBaseTriplePatternBinder.scala:50-213)."""
    return [tp for _g, tp in collect_patterns_g(group)]


def collect_patterns_g(
    group: Group, gctx: str | None = None
) -> list[tuple[str | None, TriplePattern]]:
    """Every reachable triple pattern paired with its graph context:
    None = default graph (outside any GRAPH), ``?g`` = any named graph,
    ``<iri>`` = that named graph. Mirrors the evaluator's graph
    propagation (``_group_df_info``): GRAPH sets the context for its
    sub-group; everything else inherits."""
    out: list[tuple[str | None, TriplePattern]] = [
        (gctx, tp) for tp in group.patterns
    ]
    for g in group.optionals:
        out.extend(collect_patterns_g(g, gctx))
    for branches in group.unions:
        for g in branches:
            out.extend(collect_patterns_g(g, gctx))
    for gterm, g in group.graphs:
        out.extend(collect_patterns_g(g, gterm))
    for _pos, g in group.exists:
        out.extend(collect_patterns_g(g, gctx))
    for g in group.minuses:
        out.extend(collect_patterns_g(g, gctx))
    for sub in group.subselects:
        out.extend(collect_patterns_g(sub.where, gctx))
    return out


def _pred_candidates(p) -> frozenset[str] | None:
    """Constant-predicate candidates of a pattern's predicate position:
    a frozenset of ``<iri>`` strings, or None = unrestricted (variable
    predicate, negated property set, or a path with a possibly
    zero-length step, whose domain is every node of the graph)."""
    if isinstance(p, Path):
        if p.op in ("star", "opt", "nps"):
            return None
        acc: set[str] = set()
        for arg in p.args:
            sub = _pred_candidates(arg)
            if sub is None:
                return None
            acc |= sub
        return frozenset(acc)
    if _is_var(p):
        return None
    return frozenset((p,))


# ---------------------------------------------------------------------------
# per-(pattern, triples map) binding — bindmTP analogue
# ---------------------------------------------------------------------------


def _constant_term(term_map, options: CompileOptions) -> str | None:
    if term_map.kind != CONSTANT:
        return None
    member_tt, datatype, language = term_map.member_term_info()
    return terms.make_term(
        term_map.constant, member_tt, datatype, language,
        options.encode_unsafe_chars_in_uri,
    )


def _template_invariant(template: str) -> bool:
    """True when the template's literal parts are unchanged by the IRI
    encoding chain, so textual template matching against an output IRI
    is trustworthy as an exclusion test."""
    masked = re.sub(r"\{[^}]*\}", "", template)
    return bool(_ENCODING_INVARIANT.match(masked))


def _iri_can_match(term_map, iri_term: str, options: CompileOptions) -> bool:
    """Can this term map ever produce the constant ``<iri>`` term?
    False only on *proof* of impossibility (bindmTP's compatibility
    checks, MorphBaseTriplePatternBinder.scala:223-249)."""
    tt = term_map.infer_term_type()
    if tt == terms.TERM_LITERAL:
        return False
    if tt == terms.TERM_BLANKNODE:
        return False
    if term_map.kind == CONSTANT:
        return _constant_term(term_map, options) == iri_term
    if term_map.kind == TEMPLATE and _template_invariant(term_map.template):
        if not get_template_groups(term_map.template):
            # a group-less template renders its fixed text verbatim
            # (invariant => the encoding chain is the identity on it)
            return term_map.template == iri_term[1:-1]
        return bool(get_template_matching(term_map.template, iri_term[1:-1]))
    return True


def _literal_can_match(term_map, lit: dict, options: CompileOptions) -> bool:
    """Can this term map produce the parsed literal binding ``lit``
    ({'value':…, 'datatype'?, 'xml:lang'?})?"""
    member_tt, datatype, language = term_map.member_term_info()
    if member_tt != terms.TERM_LITERAL:
        return False
    if term_map.kind == CONSTANT:
        want = terms.make_literal(lit["value"], lit.get("datatype"), lit.get("xml:lang"))
        return _constant_term(term_map, options) == want
    if language is not None and lit.get("xml:lang") != language:
        return False
    if lit.get("xml:lang") and language is None:
        return False
    if datatype is not None and lit.get("datatype") != datatype:
        return False
    # column/reference maps infer a datatype from the source type at
    # compile time — unknown here, so stay in (reducer, not oracle)
    return True


def _subject_compatible(tm: TriplesMap, s, options: CompileOptions) -> bool:
    if _is_var(s):
        return True
    sm = tm.subject_map
    if s.startswith("<"):
        return _iri_can_match(sm, s, options)
    if s.startswith("_:"):
        return sm.infer_term_type() == terms.TERM_BLANKNODE
    return False  # literal subjects cannot exist


# sentinel: no graph pruning (triples-mode fragment over one merged graph)
_ANY_GRAPH = object()


def _graph_info(
    sm, pom: PredicateObjectMap | None, options: CompileOptions
) -> tuple[bool, frozenset[str] | None]:
    """(can emit into the default graph, constant named-graph IRIs or
    None = at least one non-constant graph map). Per materializeQuads
    (MorphBaseMaterializer.scala:159-200): POM triples land in
    subjectMap graphs ∪ POM graphs; class triples in subjectMap graphs;
    no graph maps ⇒ default graph. rr:defaultGraph constants are
    dropped at parse, so any graph map here emits a *named* graph."""
    gms = list(sm.graph_maps) + (list(pom.graph_maps) if pom is not None else [])
    if not gms:
        return True, frozenset()
    named: set[str] = set()
    for gm in gms:
        if gm.kind != CONSTANT:
            return False, None
        named.add(terms.make_iri(gm.constant, options.encode_unsafe_chars_in_uri))
    return False, frozenset(named)


def _graph_ok(info: tuple[bool, frozenset[str] | None], gctx) -> bool:
    """Can a branch with graph signature ``info`` emit a quad visible in
    graph context ``gctx``? (None = default graph, ?var = any named
    graph, <iri> = that graph, frozenset = one of those named graphs —
    the FROM/FROM NAMED dataset-clause form.) False only on proof of
    impossibility."""
    if gctx is _ANY_GRAPH:
        return True
    can_default, named = info
    if gctx is None:
        return can_default
    if isinstance(gctx, frozenset):
        return named is None or bool(named & gctx)
    if _is_var(gctx):
        return named is None or bool(named)
    return named is None or gctx in named


def _pom_emits_collection(pom: PredicateObjectMap) -> bool:
    if any(om.is_collection for om in pom.object_maps):
        return True
    return any(rom.collection_term_type() for rom in pom.ref_object_maps)


def _pom_pred_compatible(
    pom: PredicateObjectMap,
    preds: frozenset[str] | None,
    options: CompileOptions,
) -> bool:
    if preds is None:
        return True
    if _pom_emits_collection(pom) and any(
        p.startswith(f"<{terms.RDF_NS}") for p in preds
    ):
        # rdf:first/rest/_N/nil cells come from this POM's expansion
        # (excludeTriplesAboutCollecOrContainer keeps these OUT of the
        # reference's rewriting; we keep them IN the fragment instead)
        return True
    for pm in pom.predicate_maps:
        const = _constant_term(pm, options)
        if const is None:  # template/column predicate — unknown at bind time
            return True
        if const in preds:
            return True
    return False


def _prune_pom(
    pom: PredicateObjectMap, tp: TriplePattern, options: CompileOptions
) -> PredicateObjectMap | None:
    """Drop the POM (or its provably incompatible object maps) for one
    pattern; None = the POM cannot contribute."""
    preds = _pred_candidates(tp.p)
    if not _pom_pred_compatible(pom, preds, options):
        return None
    o = tp.o
    # object-based exclusion only for a plain predicate position (a path
    # pattern's intermediate hops are unconstrained) and non-collection
    # POMs (their connecting object is a generated blank node)
    if isinstance(tp.p, Path) or _is_var(o) or _pom_emits_collection(pom):
        return pom
    keep_oms = []
    for om in pom.object_maps:
        if o.startswith("<"):
            ok = _iri_can_match(om, o, options)
        elif o.startswith("_:"):
            ok = om.infer_term_type() == terms.TERM_BLANKNODE
        else:
            lit = parse_term(o)
            ok = _literal_can_match(om, lit, options)
        if ok:
            keep_oms.append(om)
    # a RefObjectMap's object is the parent's subject term — an IRI or
    # blank node, never a literal
    keep_roms = (
        list(pom.ref_object_maps)
        if (o.startswith("<") or o.startswith("_:"))
        else []
    )
    if not keep_oms and not keep_roms:
        return None
    return replace(
        pom, object_maps=tuple(keep_oms), ref_object_maps=tuple(keep_roms)
    )


def _bind_detail(
    tm: TriplesMap, tp: TriplePattern, options: CompileOptions, gctx=_ANY_GRAPH
) -> tuple[tuple[str, ...], list[tuple[int, PredicateObjectMap]]] | None:
    """(kept class IRIs, [(original POM index, pruned POM)]) for one
    (pattern, triples map) pair, or None when the map provably cannot
    produce a matching triple. The index survives pruning so bindings of
    several patterns to the same map can merge into one compilation.
    ``gctx`` (quad mode) additionally excludes branches whose graph maps
    provably cannot emit into the pattern's graph context."""
    # A property-path pattern's constant subject constrains only ONE end
    # of the path: intermediate/terminal hop triples have other subjects,
    # and an inverse step (^p) puts the pattern subject in the data
    # OBJECT position. The evaluator (bgp._pattern_df) applies endpoint
    # constants AFTER computing path pairs over the whole frame, so the
    # fragment must keep every map that can emit a path-predicate triple
    # regardless of subject — mirror _prune_pom/_residual, which already
    # exempt path patterns from object/constant restriction.
    if not isinstance(tp.p, Path) and not _subject_compatible(
        tm, tp.s, options
    ):
        return None
    preds = _pred_candidates(tp.p)

    keep_classes = tm.subject_map.class_uris
    if not _graph_ok(_graph_info(tm.subject_map, None, options), gctx):
        keep_classes = ()
    elif preds is not None and _RDF_TYPE not in preds:
        keep_classes = ()
    elif (
        not isinstance(tp.p, Path)
        and not _is_var(tp.o)
        and tp.o.startswith("<")
        and preds == frozenset((_RDF_TYPE,))
    ):
        want = tp.o
        keep_classes = tuple(
            c for c in keep_classes
            if terms.make_iri(c, options.encode_unsafe_chars_in_uri) == want
        )

    kept: list[tuple[int, PredicateObjectMap]] = []
    for i, pom in enumerate(tm.predicate_object_maps):
        if not _graph_ok(_graph_info(tm.subject_map, pom, options), gctx):
            continue
        pruned = _prune_pom(pom, tp, options)
        if pruned is not None:
            kept.append((i, pruned))

    if not kept and not keep_classes:
        return None
    return tuple(keep_classes), kept


def _detail_to_tm(
    tm: TriplesMap,
    detail: tuple[tuple[str, ...], list[tuple[int, PredicateObjectMap]]],
) -> TriplesMap:
    keep_classes, kept = detail
    sm = tm.subject_map
    if keep_classes != tm.subject_map.class_uris:
        sm = replace(sm, class_uris=keep_classes)
    return replace(
        tm,
        subject_map=sm,
        predicate_object_maps=tuple(pom for _i, pom in kept),
    )


def _merge_details(
    tm: TriplesMap,
    details: list[tuple[tuple[str, ...], list[tuple[int, PredicateObjectMap]]]],
) -> TriplesMap:
    """Union of several patterns' prunings of the same triples map —
    the widest fragment any of them needs, compiled (and scanned) once.
    This is the rewriting-mode twin of the reference's self-join
    elimination (MorphBaseQueryOptimizer: several triple patterns over
    one logical source share its query)."""
    class_set: set[str] = set()
    for keep_classes, _k in details:
        class_set.update(keep_classes)
    classes = tuple(c for c in tm.subject_map.class_uris if c in class_set)

    merged: dict[int, PredicateObjectMap] = {}
    for _c, kept in details:
        for i, pom in kept:
            prev = merged.get(i)
            if prev is None:
                merged[i] = pom
                continue
            # widen: union of surviving object maps / ref-object maps
            # (term-map objects keep their identity through replace())
            oms = list(prev.object_maps)
            oms += [om for om in pom.object_maps if not any(om is o for o in oms)]
            roms = list(prev.ref_object_maps)
            roms += [
                rm for rm in pom.ref_object_maps
                if not any(rm is r for r in roms)
            ]
            merged[i] = replace(
                prev, object_maps=tuple(oms), ref_object_maps=tuple(roms)
            )
    sm = tm.subject_map
    if classes != tm.subject_map.class_uris:
        sm = replace(sm, class_uris=classes)
    return replace(
        tm,
        subject_map=sm,
        predicate_object_maps=tuple(merged[i] for i in sorted(merged)),
    )


def _tm_binding(
    tm: TriplesMap, tp: TriplePattern, options: CompileOptions
) -> TriplesMap | None:
    """The pattern-pruned view of one triples map, or None when the map
    provably cannot produce a triple matching the pattern."""
    detail = _bind_detail(tm, tp, options)
    return None if detail is None else _detail_to_tm(tm, detail)


def bind_patterns(
    doc: MappingDocument,
    query: SelectQuery,
    options: CompileOptions | None = None,
) -> dict[int, list[tuple[TriplePattern, TriplesMap]]]:
    """bindm analogue: pattern index -> [(pattern, pruned triples map)].
    Purely driver-side over the mapping tree; no data is touched."""
    options = options or CompileOptions()
    out: dict[int, list[tuple[TriplePattern, TriplesMap]]] = {}
    for i, tp in enumerate(collect_patterns(query.where)):
        bound = []
        for tm in doc.triples_maps.values():
            pruned = _tm_binding(tm, tp, options)
            if pruned is not None:
                bound.append((tp, pruned))
        out[i] = bound
    return out


# ---------------------------------------------------------------------------
# constant pushdown — genCond analogue, as a Catalyst source filter
# ---------------------------------------------------------------------------


def _single_column_template(term_map) -> str | None:
    """The lone simple source column of a one-group Column-formulation
    template, else None."""
    if term_map.kind != TEMPLATE or term_map.ref_formulation != "Column":
        return None
    groups = get_template_groups(term_map.template)
    if len(groups) != 1:
        return None
    msp = MixedSyntaxPath.parse(groups[0], "Column")
    return msp.referenced_column if msp.is_simple_column else None


def _typed_key(value: str, dtype) -> object | None:
    """The lexical ``value`` as a Python literal of the column's type,
    or None when it cannot be a row's lexical form / the type needs the
    lexical fallback. Comparing in the COLUMN's type (instead of
    casting the column to string) is what lets the filter reach the
    parquet scan as a PushedFilter — a column-side cast defeats
    pushdown. The typed comparison is a SUPERSET of 'lexical form ==
    value' for these types (their lex_value_col forms round-trip
    through parsing); callers' exact residual / post-filters remove the
    slack, so soundness needs only the superset direction."""
    import decimal

    try:
        if isinstance(dtype, T.BooleanType):
            return {"true": True, "false": False}.get(value)
        if isinstance(
            dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            return int(value)
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            return float(value)
        if isinstance(dtype, T.DecimalType):
            return decimal.Decimal(value)
        if isinstance(dtype, T.StringType):
            return value
    except (ValueError, decimal.InvalidOperation, OverflowError):
        return None
    return None


def _key_in_filter(col_name: str, dtype, values: list[str]) -> Column:
    """Scan filter for 'the column's lexical form is one of values':
    typed IN-list when the type allows (parquet-pushable), lexical
    string comparison otherwise."""
    if isinstance(
        dtype,
        (T.BooleanType, T.NumericType, T.StringType),
    ):
        typed = [t for t in (_typed_key(v, dtype) for v in values)
                 if t is not None]
        return F.col(col_name).isin(typed) if typed else F.lit(False)
    lex = terms.lex_value_col(F.col(col_name), dtype)
    return lex.isin(values) if values else F.lit(False)


def _subject_pushdown(
    tm: TriplesMap, s: str, src: DataFrame, options: CompileOptions
) -> Column | None:
    """Catalyst filter implied by ``subj == s`` for every triple this
    map emits, or None. Only claimed when the template inversion is
    provably a superset: one group, encoding-invariant fixed parts, and
    a recovered value on which percent-encoding is the identity; the
    caller's exact residual makes the fragment tight."""
    if not s.startswith("<"):
        return None
    sm = tm.subject_map
    col = _single_column_template(sm)
    if col is None or col not in src.columns:
        return None
    if not _template_invariant(sm.template):
        return None
    match = get_template_matching(sm.template, s[1:-1])
    if len(match) != 1:
        return None
    value = next(iter(match.values()))
    if not _UNRESERVED.match(value):
        return None
    dtype = src.schema[col].dataType
    return _key_in_filter(col, dtype, [value])


def _object_pushdown(
    pruned: TriplesMap, tp: TriplePattern, src: DataFrame
) -> Column | None:
    """Catalyst filter implied by ``obj == tp.o`` — only when the pruned
    map emits triples from exactly one plain object map, so the filter
    cannot suppress a row another branch still needs. Literal objects
    key a plain column; IRI objects invert a single-group
    encoding-invariant template (the taxref
    ``?t skosxl:altLabel <label/60587>`` shape, whose constant reduces
    the pattern's own scan even when no join-side optimization applies)."""
    if isinstance(tp.p, Path) or _is_var(tp.o):
        return None
    if pruned.subject_map.class_uris or len(pruned.predicate_object_maps) != 1:
        return None
    pom = pruned.predicate_object_maps[0]
    if pom.ref_object_maps or len(pom.object_maps) != 1:
        return None
    om = pom.object_maps[0]
    if om.is_collection:
        return None
    if tp.o.startswith('"'):
        if om.kind != COLUMN or om.column not in src.columns:
            return None
        lit = parse_term(tp.o)
        raw = lit["value"]
        dtype = src.schema[om.column].dataType
        return _key_in_filter(om.column, dtype, [raw])
    if (
        tp.o.startswith("<")
        and om.kind == TEMPLATE
        and om.infer_term_type() == terms.TERM_IRI
        and _template_invariant(om.template)
    ):
        col = _single_column_template(om)
        if col is None or col not in src.columns:
            return None
        match = get_template_matching(om.template, tp.o[1:-1])
        if len(match) != 1:
            return None
        value = next(iter(match.values()))
        if not _UNRESERVED.match(value):
            return None
        return _key_in_filter(col, src.schema[col].dataType, [value])
    return None


def _simple_json_field(expr: str) -> str | None:
    """``$.a.b`` -> ``a.b`` when get_json_object evaluates the
    reference identically (see functions.paths.simple_json_field);
    ``$._id`` rewrites to ``$._id.$oid`` whose ``$oid`` segment is
    rejected there."""
    from ..functions.paths import simple_json_field

    return simple_json_field(rewrite_mongo_id(expr))


def _doc_value_filter(doc: Column, field: str, value: str) -> Column:
    """Keep exactly the documents whose ``field`` COULD render as the
    lexical ``value`` during term construction — the document-source
    analogue of the reference's JsonPathToMongoTranslator pushing a
    SPARQL constant into the Mongo find() query (rules R0-R9,
    JsonPathToMongoTranslator.scala:242-463), expressed as a Catalyst
    predicate on the raw document column so it reaches the scan.

    Never a false exclusion (the binder is a reducer; the per-pattern
    residual makes the fragment exact):
      * missing field / JSON null  -> get_json_object NULL, and the
        template/reference evaluator drops None values (no term), so
        ``IS NOT NULL`` is implied;
      * scalar string -> get_json_object returns the decoded text, equal
        to the evaluated value;
      * numbers -> formatting may differ ("1" vs "1.0" vs "1e0"), so
        numeric equality is accepted too;
      * booleans -> Python renders "True"/"False" vs JSON "true", so
        case-insensitive equality is accepted;
      * arrays/objects (prefix ``[``/``{``) -> evaluation semantics
        diverge from get_json_object, so such rows are always kept.
    """
    gj = F.get_json_object(doc, "$." + field)
    cond = (
        gj.startswith("[")
        | gj.startswith("{")
        | (F.lower(gj) == F.lit(value.lower()))
    )
    try:
        num = float(value)
    except ValueError:
        pass
    else:
        if num == num and num not in (float("inf"), float("-inf")):
            cond = cond | (gj.try_cast("double") == F.lit(num))
    return gj.isNotNull() & cond


def _doc_subject_pushdown(
    pruned: TriplesMap, s: str, doc: Column, options: CompileOptions
) -> Column | None:
    """Document-source twin of :func:`_subject_pushdown`: the Catalyst
    filter implied by ``subj == s`` on the raw document column, or None
    when the template inversion is not provably exact."""
    if not s.startswith("<"):
        return None
    sm = pruned.subject_map
    if sm.kind != TEMPLATE or sm.ref_formulation != "JSONPath":
        return None
    if not _template_invariant(sm.template):
        return None
    groups = get_template_groups(sm.template)
    if len(groups) != 1:
        return None
    field = _simple_json_field(groups[0])
    if field is None:
        return None
    match = get_template_matching(sm.template, s[1:-1])
    if len(match) != 1:
        return None
    value = next(iter(match.values()))
    if not _UNRESERVED.match(value):
        return None
    return _doc_value_filter(doc, field, value)


def _doc_object_pushdown(
    pruned: TriplesMap, tp: TriplePattern, doc: Column
) -> Column | None:
    """Document-source twin of :func:`_object_pushdown`: a literal
    object over a single plain JSONPath reference object map, or an IRI
    object inverting a single-group JSONPath template object map."""
    if isinstance(tp.p, Path) or _is_var(tp.o):
        return None
    if pruned.subject_map.class_uris or len(pruned.predicate_object_maps) != 1:
        return None
    pom = pruned.predicate_object_maps[0]
    if pom.ref_object_maps or len(pom.object_maps) != 1:
        return None
    om = pom.object_maps[0]
    if om.is_collection:
        return None
    if tp.o.startswith('"'):
        if om.kind != REFERENCE or om.ref_formulation != "JSONPath":
            return None
        field = _simple_json_field(om.reference)
        if field is None:
            return None
        lit = parse_term(tp.o)
        return _doc_value_filter(doc, field, lit["value"])
    if (
        tp.o.startswith("<")
        and om.kind == TEMPLATE
        and om.ref_formulation == "JSONPath"
        and om.infer_term_type() == terms.TERM_IRI
        and _template_invariant(om.template)
    ):
        groups = get_template_groups(om.template)
        if len(groups) != 1:
            return None
        field = _simple_json_field(groups[0])
        if field is None:
            return None
        match = get_template_matching(om.template, tp.o[1:-1])
        if len(match) != 1:
            return None
        value = next(iter(match.values()))
        if not _UNRESERVED.match(value):
            return None
        return _doc_value_filter(doc, field, value)
    return None


def _constant_terms_at(
    tm: TriplesMap, pos: str, options: CompileOptions
) -> set[str] | None:
    """Every term the pruned map can emit at position ``pos`` ('s'/'p'/
    'o'), when ALL of them are constants; None as soon as any is
    data-dependent (the constant-projection rewrite then bails).
    rr:class emits constant rdf:type/class terms; RdfList collections
    emit constant rdf:first/rdf:rest predicates but generated chain
    bnodes as objects; containers emit data-dependent rdf:_n
    predicates."""
    out: set[str] = set()
    sm = tm.subject_map
    if pos == "s":
        if sm.kind != CONSTANT or sm.infer_term_type() != terms.TERM_IRI:
            return None
        out.add(_constant_term(sm, options))
        return out
    if pos == "p":
        if sm.class_uris:
            out.add(f"<{terms.RDF_TYPE}>")
        for pom in tm.predicate_object_maps:
            has_list = False
            for om in pom.object_maps:
                ctt = om.collection_term_type()
                if ctt is None:
                    continue
                if ctt == terms.TERM_RDFLIST:
                    has_list = True
                else:
                    return None  # containers: rdf:_1, rdf:_2, ... per row
            if has_list:
                out.add(f"<{terms.RDF_FIRST}>")
                out.add(f"<{terms.RDF_REST}>")
            for pm in pom.predicate_maps:
                if pm.kind != CONSTANT:
                    return None
                out.add(_constant_term(pm, options))
        return out
    for cls in sm.class_uris:
        out.add(terms.make_iri(cls, False))
    for pom in tm.predicate_object_maps:
        if pom.ref_object_maps:
            return None  # parent subjects are data-dependent
        for om in pom.object_maps:
            if om.is_collection or om.kind != CONSTANT:
                return None  # chain heads are generated bnodes
            out.add(_constant_term(om, options))
    return out


def _nodes_subject_pushdown(
    tm: TriplesMap, nodes: list[str], src: DataFrame, options: CompileOptions
) -> Column | None:
    """Disjunctive twin of :func:`_subject_pushdown`: the source filter
    implied by ``subj IN nodes``, or None when inversion is not provably
    exact for every IRI node. Sound only for rows feeding SUBJECT
    production — callers compile object-producing branches separately
    and keep the exact subj/obj post-filter. At scale this is what
    makes a k-node DESCRIBE scan O(k) source rows (key-level IN filter
    at the parquet scan) instead of the full table."""
    sm = tm.subject_map
    if sm.infer_term_type() != terms.TERM_IRI:
        return None
    col = _single_column_template(sm)
    if col is None or col not in src.columns:
        return None
    if not _template_invariant(sm.template):
        return None
    values: list[str] = []
    for n in nodes:
        if not n.startswith("<"):
            continue  # an IRI-template subject never matches a bnode
        match = get_template_matching(sm.template, n[1:-1])
        if len(match) != 1:
            continue  # provably never this map's subject
        value = next(iter(match.values()))
        if not _UNRESERVED.match(value):
            return None  # inversion not provably exact: no filter
        values.append(value)
    dtype = src.schema[col].dataType
    return _key_in_filter(col, dtype, values)


def _doc_nodes_pushdown(
    tm: TriplesMap, nodes: list[str], doc: Column, options: CompileOptions
) -> Column | None:
    """Document-source twin of :func:`_nodes_subject_pushdown`: OR of
    per-node raw-document filters."""
    sm = tm.subject_map
    if sm.infer_term_type() != terms.TERM_IRI:
        return None
    if sm.kind != TEMPLATE or sm.ref_formulation != "JSONPath":
        return None
    if not _template_invariant(sm.template):
        return None
    groups = get_template_groups(sm.template)
    if len(groups) != 1:
        return None
    field = _simple_json_field(groups[0])
    if field is None:
        return None
    values: list[str] = []
    for n in nodes:
        if not n.startswith("<"):
            continue
        match = get_template_matching(sm.template, n[1:-1])
        if len(match) != 1:
            continue
        value = next(iter(match.values()))
        if not _UNRESERVED.match(value):
            return None
        values.append(value)
    if not values:
        return F.lit(False)
    if len(values) > 64:
        # each disjunct re-evaluates get_json_object per row; past a few
        # dozen the OR-chain costs more than the full scan it avoids
        return None
    cond = _doc_value_filter(doc, field, values[0])
    for value in values[1:]:
        cond = cond | _doc_value_filter(doc, field, value)
    return cond


# ---------------------------------------------------------------------------
# cross-pattern condition propagation
# ---------------------------------------------------------------------------
# The reference copies Equals/IsNotNull conditions between the two sides
# of a join when the condition's reference is also the reference
# projected as a shared variable
# (AbstractQueryAtomicMongo.propagateConditionFromJoinedQuery:269-316;
# child->parent equality push MorphMongoQueryTranslator.scala:426-431),
# so BOTH patterns' source scans are reduced — its taxref notes showcase
# ``?t skosxl:prefLabel <label/60585> . ?t skosxl:altLabel ?a`` ("very
# big inner join but with propagation of conditions"). Spark-first
# re-expression: a required pattern's constant terms invert (via the
# term-map template) into key-value constraints on the pattern's OWN
# VARIABLES; a variable constrained the same way by EVERY binding of
# that pattern carries the constraint query-wide, and any other
# pattern's binding whose term map for that variable uses the *same
# template string and term type* gets the implied typed IN-filter
# pushed into its source scan. Soundness: equal single-group templates
# with encoding-invariant fixed parts render equal terms iff the
# percent-encoded group values are equal, and encoding is injective, so
# term equality forces key equality; the typed IN-list is a documented
# superset (_typed_key) and the evaluator's own join removes the slack.


def _template_shape(template: str) -> tuple[str, str] | None:
    """(prefix, suffix) around THE single group of a template, or None
    when the template has != 1 group. Two single-group templates with
    equal shapes and encoding-invariant fixed parts render equal terms
    iff their percent-encoded group values are equal — the propagation
    comparison key. Shape (not whole-template) equality matters because
    the reference transfers the VALUE between *different* references
    projected as the same variable (taxref: the constraint inverts on
    ``taxon/{$.codeTaxon}`` but applies to ``taxon/{$.codeReference}``)."""
    from ..functions.templates import _GROUP_RE, _mask_paths

    masked, _paths = _mask_paths(template)
    ms = list(_GROUP_RE.finditer(masked))
    if len(ms) != 1:
        return None
    return masked[: ms[0].start()], masked[ms[0].end():]


def _binding_var_keys(
    pruned: TriplesMap, tp: TriplePattern, options: CompileOptions
) -> dict[str, tuple[tuple[str, str], str, tuple[str, ...]]]:
    """var -> (template shape, term type, key values) constraints
    implied by this binding's constant terms on the pattern's variable
    terms. A constraint is emitted only when the constant's inverted
    reference is the SAME source reference the variable's term map reads
    (the reference's projected-reference condition match), the
    variable's term map is a single-group encoding-invariant template,
    and the inverted value is encoding-unreserved."""
    out: dict[str, tuple[str, str, tuple[str, ...]]] = {}
    if isinstance(tp.p, Path):
        return out
    sm = pruned.subject_map
    s_ref = None
    if sm.kind == TEMPLATE and _template_invariant(sm.template):
        groups = get_template_groups(sm.template)
        if len(groups) == 1:
            s_ref = groups[0]
    # the single object map this pattern can match through, when the
    # pruning proves there is exactly one way (no classes, one POM, one
    # OM, no RefObjectMap, no collection) — otherwise a constant object
    # does not determine a unique reference
    single_om = None
    if not sm.class_uris and len(pruned.predicate_object_maps) == 1:
        pom = pruned.predicate_object_maps[0]
        if not pom.ref_object_maps and len(pom.object_maps) == 1:
            om = pom.object_maps[0]
            if not om.is_collection:
                single_om = om
    o_ref = o_tmpl = None
    if single_om is not None:
        if single_om.kind == TEMPLATE and _template_invariant(
            single_om.template
        ):
            og = get_template_groups(single_om.template)
            if len(og) == 1:
                o_ref, o_tmpl = og[0], single_om.template
        elif single_om.kind == COLUMN:
            o_ref = single_om.column
        elif single_om.kind == REFERENCE:
            o_ref = single_om.reference

    # constant-derived (reference, lexical value) pairs — genCond
    pairs: list[tuple[str, str]] = []
    if not _is_var(tp.s) and tp.s.startswith("<") and s_ref is not None:
        match = get_template_matching(sm.template, tp.s[1:-1])
        if len(match) == 1:
            value = next(iter(match.values()))
            if _UNRESERVED.match(value):
                pairs.append((s_ref, value))
    if not _is_var(tp.o) and o_ref is not None:
        if tp.o.startswith("<") and o_tmpl is not None:
            match = get_template_matching(o_tmpl, tp.o[1:-1])
            if len(match) == 1:
                value = next(iter(match.values()))
                if _UNRESERVED.match(value):
                    pairs.append((o_ref, value))
        elif tp.o.startswith('"') and o_tmpl is None:
            pairs.append((o_ref, parse_term(tp.o)["value"]))
    if not pairs:
        return out

    if (
        _is_var(tp.s)
        and s_ref is not None
        and sm.infer_term_type() == terms.TERM_IRI
    ):
        vals = tuple(sorted({v for r, v in pairs if r == s_ref}))
        shape = _template_shape(sm.template)
        if vals and shape is not None:
            out[tp.s] = (shape, terms.TERM_IRI, vals)
    if (
        _is_var(tp.o)
        and o_tmpl is not None
        and single_om.infer_term_type() == terms.TERM_IRI
    ):
        vals = tuple(sorted({v for r, v in pairs if r == o_ref}))
        shape = _template_shape(o_tmpl)
        if vals and shape is not None:
            out[tp.o] = (shape, terms.TERM_IRI, vals)
    return out


def _prop_scan_filter(
    pruned: TriplesMap,
    tp: TriplePattern,
    prop: dict[str, list[tuple[tuple[str, str], str, tuple[str, ...]]]],
    src: DataFrame | None = None,
    doc: Column | None = None,
) -> Column | None:
    """AND of the scan filters the propagated variable constraints imply
    on THIS binding, or None. A constraint applies to a position only
    when the position's term map is a single-group invariant template of
    the SAME SHAPE and term type as the constraint's — templates of a
    different shape can render the same term, so they are skipped,
    never filtered."""

    def tmpl_filter(term_map, constraint) -> Column | None:
        shape, ttype, vals = constraint
        if term_map.kind != TEMPLATE:
            return None
        if not _template_invariant(term_map.template):
            return None
        if term_map.infer_term_type() != ttype:
            return None
        if shape is None:
            # a TERM-level constraint (VALUES inline data): invert each
            # node against THIS target's template — non-matching nodes
            # provably never come from this branch (dropped from the
            # key set; an empty set filters the branch to nothing),
            # non-exact inversions disable the filter entirely
            if _template_shape(term_map.template) is None:
                return None
            keys: list[str] = []
            for n in vals:
                match = get_template_matching(term_map.template, n[1:-1])
                if len(match) != 1:
                    continue
                value = next(iter(match.values()))
                if not _UNRESERVED.match(value):
                    return None
                keys.append(value)
            vals = tuple(keys)
        elif _template_shape(term_map.template) != shape:
            return None
        if src is not None:
            col = _single_column_template(term_map)
            if col is None or col not in src.columns:
                return None
            return _key_in_filter(col, src.schema[col].dataType, list(vals))
        if term_map.ref_formulation != "JSONPath":
            return None
        groups = get_template_groups(term_map.template)
        field = _simple_json_field(groups[0]) if len(groups) == 1 else None
        if field is None or len(vals) > 64:
            return None
        if not vals:
            return F.lit(False)
        cond = _doc_value_filter(doc, field, vals[0])
        for v in vals[1:]:
            cond = cond | _doc_value_filter(doc, field, v)
        return cond

    conds: list[Column] = []
    if _is_var(tp.s) and tp.s in prop:
        # every POM of the branch shares the subject, so a subject-side
        # filter cannot starve a sibling object map
        for constraint in prop[tp.s]:
            f = tmpl_filter(pruned.subject_map, constraint)
            if f is not None:
                conds.append(f)
    if _is_var(tp.o) and tp.o in prop and not isinstance(tp.p, Path):
        sm = pruned.subject_map
        if not sm.class_uris and len(pruned.predicate_object_maps) == 1:
            pom = pruned.predicate_object_maps[0]
            if not pom.ref_object_maps and len(pom.object_maps) == 1:
                om = pom.object_maps[0]
                if not om.is_collection:
                    for constraint in prop[tp.o]:
                        f = tmpl_filter(om, constraint)
                        if f is not None:
                            conds.append(f)
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


# ---------------------------------------------------------------------------
# the virtual graph
# ---------------------------------------------------------------------------


class VirtualGraph:
    """Answer SPARQL queries over the graph a mapping *would* produce,
    materializing only the fragments the query's patterns can touch.

    ``fragment(query)`` is the reduced triple frame (the distributed
    analogue of the reference's temporary Jena graph,
    MorphMongoQueryProcessor.process:45-150); ``select`` / ``construct``
    / ``ask`` / ``describe`` evaluate the full SPARQL surface over it
    with the ordinary distributed evaluator."""

    def __init__(
        self,
        spark: SparkSession,
        doc: MappingDocument,
        catalog: SourceCatalog,
        options: CompileOptions | None = None,
    ):
        self.spark = spark
        self.doc = doc
        self.catalog = catalog
        self.options = options or CompileOptions()
        self._compilers: list[MappingCompiler] = []
        self._persisted: list[DataFrame] = []

    # -- fragment construction --------------------------------------------

    def _filtered_catalog(self, table: str, cond: Column) -> SourceCatalog:
        cat = SourceCatalog(
            self.spark, dict(self.catalog.tables), dict(self.catalog.doc_columns)
        )
        cat.unique_keys = dict(self.catalog.unique_keys)
        cat.tables[table] = self.catalog._table(table).filter(cond)
        return cat

    def _doc_column(self, collection: str) -> Column | None:
        """The raw document column of a registered find() collection
        (explicitly registered, or the single string column), as it
        exists BEFORE resolve() — pushdown filters prepend to the scan.
        None for row-shaped multi-column sources (their ``__doc__`` is
        synthesized later, so there is nothing to filter on yet)."""
        try:
            src = self.catalog._table(collection)
        except Exception:  # noqa: BLE001 — unregistered collection
            return None
        name = self.catalog.doc_columns.get(collection)
        if name is None and len(src.columns) == 1:
            field = src.schema.fields[0]
            if field.dataType.simpleString() == "string":
                name = field.name
        if name is None or name not in src.columns:
            return None
        return F.col(name)

    def _rom_parent_reads(self, pruned: TriplesMap, table: str) -> bool:
        """True when any retained RefObjectMap's parent triples map may
        read ``table`` — pushdown must then be skipped, because the
        filtered catalog entry would starve the parent side of the join
        (a self-join ROM's parent rows rarely satisfy the child's
        subject constraint). SQL-query parents are treated as 'may
        read' (their table set is not statically known here)."""
        for pom in pruned.predicate_object_maps:
            for rom in pom.ref_object_maps:
                ptm = self.doc.triples_maps.get(rom.parent_triples_map)
                if ptm is None:
                    return True
                pls = ptm.logical_source
                if pls.kind == "table":
                    if pls.value == table:
                        return True
                    continue
                m = _MONGO_FIND_RE.match(pls.value)
                if m is None or m.group("collection") == table:
                    return True
        return False

    def _compile_tm(
        self,
        name: str,
        pruned: TriplesMap,
        catalog: SourceCatalog,
        quads: bool = False,
    ) -> DataFrame | None:
        doc2 = MappingDocument(
            triples_maps={**self.doc.triples_maps, name: pruned},
            prefixes=self.doc.prefixes,
        )
        comp = MappingCompiler(self.spark, doc2, catalog, self.options)
        self._compilers.append(comp)
        return comp.quads_for(name) if quads else comp.triples_for(name)

    @staticmethod
    def _residual(
        frame: DataFrame, tp: TriplePattern, gctx=_ANY_GRAPH
    ) -> DataFrame:
        """Exact restriction to the pattern's constants (the binder only
        proves *possible*; these make the fragment tight). Path patterns
        get none — their intermediate hops are unconstrained. In quad
        mode the pattern's graph context restricts the graph column the
        same way the evaluator will (``_pattern_df``)."""
        if gctx is not _ANY_GRAPH and "graph" in frame.columns:
            if gctx is None:
                frame = frame.where(F.col("graph").isNull())
            elif isinstance(gctx, frozenset):
                frame = frame.where(F.col("graph").isin(list(gctx)))
            elif _is_var(gctx):
                frame = frame.where(F.col("graph").isNotNull())
            else:
                frame = frame.where(F.col("graph") == F.lit(gctx))
        if isinstance(tp.p, Path):
            return frame
        for pos, term in (("subj", tp.s), ("pred", tp.p), ("obj", tp.o)):
            if not _is_var(term):
                frame = frame.where(F.col(pos) == F.lit(term))
        return frame

    def _propagation_constraints(
        self, q: SelectQuery, quads: bool, dataset: bool
    ) -> dict[str, list[tuple[str, str, tuple[str, ...]]]]:
        """var -> [(template, term type, key values), ...] constraints
        that hold in EVERY solution of the query: derived from the
        REQUIRED top-level patterns (conjunctive, so each constrains all
        solutions), and only when every binding of the pattern agrees on
        the variable's template/type (the values union over bindings).
        Purely driver-side over the mapping tree.

        Top-level VALUES inline data adds TERM-level constraints (shape
        None): every solution binds the variable to one of the listed
        IRI terms, so each target binding inverts the terms against its
        own template — the rewriting analogue of pushing a VALUES join
        into the source scans."""
        prop: dict[str, list[tuple[object, str, tuple[str, ...]]]] = {}
        for vars_, rows in q.where.values:
            if not rows or len(rows) > 256:
                continue  # empty: query is empty anyway; huge: not a scan filter
            for vi, name in enumerate(vars_):
                col = [r[vi] for r in rows]
                if any(t is None or not t.startswith("<") for t in col):
                    continue  # UNDEF or non-IRI rows: unconstrained
                prop.setdefault("?" + name, []).append(
                    (None, terms.TERM_IRI, tuple(sorted(set(col))))
                )
        if not quads:
            gctx = _ANY_GRAPH
        elif dataset:
            gctx = frozenset(q.from_graphs)
            if not gctx:
                return prop
        else:
            gctx = None
        for tp in q.where.patterns:
            if isinstance(tp.p, Path):
                continue
            if _is_var(tp.s) and _is_var(tp.o):
                continue  # no constant to invert
            dicts: list[dict] = []
            for tm in self.doc.triples_maps.values():
                detail = _bind_detail(tm, tp, self.options, gctx)
                if detail is None:
                    continue
                dicts.append(
                    _binding_var_keys(
                        _detail_to_tm(tm, detail), tp, self.options
                    )
                )
            if not dicts:
                continue  # pattern matches nothing; fragment is empty
            common = set(dicts[0])
            for d in dicts[1:]:
                common &= set(d)
            for v in common:
                tmpls = {d[v][0] for d in dicts}
                ttypes = {d[v][1] for d in dicts}
                if len(tmpls) != 1 or len(ttypes) != 1:
                    continue  # bindings disagree: values not comparable
                vals = sorted(set().union(*(d[v][2] for d in dicts)))
                prop.setdefault(v, []).append(
                    (tmpls.pop(), ttypes.pop(), tuple(vals))
                )
        return prop

    def fragment(self, query: str | SelectQuery) -> DataFrame:
        """The deduplicated union of every bound, pushed-down branch —
        a subset of ``MappingCompiler.triples()`` sufficient to answer
        the query exactly.

        Patterns that bind the same triples map without an
        inverted-constant scan filter share ONE compilation of the
        union of their prunings (persisted, so the source is scanned
        once and each pattern's residual reads the cached fragment) —
        the rewriting-mode twin of the reference's self-join
        elimination over a shared logical-source query. Filtered
        bindings compile individually for TABLE sources (a key-pruned
        parquet scan is near-free) but fold into the shared compile for
        DOCUMENT sources when an unfiltered binding forces the full
        JSON parse anyway (the parse dominates; see the source-kind
        A/B note at the compile-decision site below).

        View selection mirrors materialize-then-query usage: a query
        with no GRAPH pattern runs over the merged-triples view
        (``MappingCompiler.triples()`` semantics — all graphs union);
        a query mentioning GRAPH runs over the dataset view
        (``quads()`` semantics — default graph is NULL, patterns
        outside GRAPH match only the default graph)."""
        q = parse_sparql(query) if isinstance(query, str) else query
        dataset = bool(q.from_graphs or q.from_named)
        quads = dataset or self._has_graphs(q.where)
        prop = self._propagation_constraints(q, quads, dataset)
        frames: list[DataFrame] = []
        # tm name -> [(pattern, graph ctx, pruning detail, scan cond)]
        collected: dict[
            str, list[tuple[TriplePattern, object, tuple, Column | None]]
        ] = {}
        conds_by_tm: dict[str, list[Column | None]] = {}
        tables: dict[str, str] = {}
        for gctx, tp in collect_patterns_g(q.where):
            if not quads:
                gctx = _ANY_GRAPH
            elif dataset:
                # under dataset clauses the pattern's graph context is a
                # *set* of named graphs: default-position patterns see
                # the FROM graphs, GRAPH patterns the FROM NAMED ones
                if gctx is None:
                    gctx = frozenset(q.from_graphs)
                elif _is_var(gctx):
                    gctx = frozenset(q.from_named)
                else:
                    gctx = frozenset((gctx,)) & frozenset(q.from_named)
                if not gctx:
                    continue  # no graph of the dataset can match
            is_path = isinstance(tp.p, Path)
            for tm in self.doc.triples_maps.values():
                detail = _bind_detail(tm, tp, self.options, gctx)
                if detail is None:
                    continue
                cond = None
                table = None
                ls = tm.logical_source
                if not ls.iterator and not is_path:
                    if ls.kind == "table":
                        table = ls.value
                        pruned = _detail_to_tm(tm, detail)
                        src = self.catalog._table(table)
                        cond = _subject_pushdown(pruned, tp.s, src, self.options)
                        ocond = _object_pushdown(pruned, tp, src)
                        if ocond is not None:
                            cond = ocond if cond is None else (cond & ocond)
                    else:
                        mfind = _MONGO_FIND_RE.match(ls.value)
                        doc_col = (
                            self._doc_column(mfind.group("collection"))
                            if mfind
                            else None
                        )
                        if doc_col is not None:
                            table = mfind.group("collection")
                            pruned = _detail_to_tm(tm, detail)
                            cond = _doc_subject_pushdown(
                                pruned, tp.s, doc_col, self.options
                            )
                            ocond = _doc_object_pushdown(pruned, tp, doc_col)
                            if ocond is not None:
                                cond = ocond if cond is None else (cond & ocond)
                    # cross-pattern condition propagation: constraints a
                    # REQUIRED pattern places on a shared variable filter
                    # this binding's scan too (propagateConditionFrom-
                    # JoinedQuery analogue; sound for any pattern
                    # position — OPTIONAL/UNION/MINUS/EXISTS solutions
                    # only matter when compatible with the required
                    # patterns, whose shared-var values are constrained)
                    if table is not None and prop:
                        if ls.kind == "table":
                            pcond = _prop_scan_filter(pruned, tp, prop, src=src)
                        else:
                            pcond = _prop_scan_filter(
                                pruned, tp, prop, doc=doc_col
                            )
                        if pcond is not None:
                            cond = pcond if cond is None else (cond & pcond)
                    # the filter replaces the CATALOG entry, so a
                    # RefObjectMap whose parent reads the same table
                    # would see its parent side starved (a self-join
                    # ROM's parent rows rarely satisfy the child's
                    # subject constraint) — keep such maps unfiltered
                    if cond is not None and self._rom_parent_reads(pruned, table):
                        cond = None
                collected.setdefault(tm.name, []).append((tp, gctx, detail, cond))
                conds_by_tm.setdefault(tm.name, []).append(cond)
                if table is not None:
                    tables[tm.name] = table
        for tm_name, entries in collected.items():
            tm = self.doc.triples_maps[tm_name]
            conds = conds_by_tm[tm_name]
            # Which entries compile individually with their scan filter,
            # and which fold into one shared compile? Source-kind-aware
            # (measured A/B at sf0.01, warm):
            # - TABLE sources: a filtered branch is a near-free
            #   key-pruned parquet scan (typed PushedFilters), so
            #   filtered branches always compile individually and only
            #   the unfiltered ones share (folding everything regressed
            #   the describe/join entries ~30%).
            # - DOCUMENT sources: every branch re-parses the raw JSON,
            #   which dominates — when an unfiltered binding forces the
            #   full parse anyway, filtered branches fold into the one
            #   shared compile instead of parsing the collection twice
            #   (measured 3.2s -> 2.0s on the find()-source entry).
            if tm.logical_source.kind == "table":
                filtered = [e for e in entries if e[3] is not None]
                shared = [e for e in entries if e[3] is None]
            elif all(c is not None for c in conds):
                filtered, shared = entries, []
            else:
                filtered, shared = [], entries
            # filtered entries with the SAME pruning and the SAME filter
            # expression share one compile (e.g. two patterns over one
            # map constrained by the same propagated variable —
            # ``?t :alt ?a . ?t :alt ?b`` — would otherwise scan the
            # filtered source once per pattern); expression-string
            # equality is the grouping key, conservative but exact
            fgroups: dict[tuple[str, str], list] = {}
            for e in filtered:
                key = (repr(e[2]), str(e[3]._jc))
                fgroups.setdefault(key, []).append(e)
            for group in fgroups.values():
                _tp0, _g0, detail, cond = group[0]
                if len(group) == 1:
                    pruned_tm = _detail_to_tm(tm, detail)
                else:
                    pruned_tm = _merge_details(
                        tm, [d for _t, _g, d, _c in group]
                    )
                frame = self._compile_tm(
                    tm_name,
                    pruned_tm,
                    self._filtered_catalog(tables[tm_name], cond),
                    quads=quads,
                )
                if frame is None:
                    continue
                if len(group) > 1:
                    frame = caching.cache(frame)
                    self._persisted.append(frame)
                for tp, gctx, _d, _c in group:
                    frames.append(self._residual(frame, tp, gctx))
            if not shared:
                continue
            if len(shared) == 1:
                tp, gctx, detail, _cond = shared[0]
                frame = self._compile_tm(
                    tm_name, _detail_to_tm(tm, detail), self.catalog, quads=quads
                )
                if frame is not None:
                    frames.append(self._residual(frame, tp, gctx))
                continue
            merged = _merge_details(tm, [d for _tp, _g, d, _c in shared])
            base = self._compile_tm(tm_name, merged, self.catalog, quads=quads)
            if base is None:
                continue
            # register through the session cache registry (not a bare
            # persist) so request-scoped release hooks — the endpoint's
            # release_since at its request boundary — reclaim the block
            # even when nothing calls VirtualGraph.release(); a
            # long-lived serve_virtual otherwise leaks one cached frame
            # per multi-pattern request
            base = caching.cache(base)
            self._persisted.append(base)
            for tp, gctx, _d, _c in shared:
                frames.append(self._residual(base, tp, gctx))
        if not frames:
            schema = "subj string, pred string, obj string"
            if quads:
                schema += ", graph string"
            return self.spark.createDataFrame([], schema)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        # set semantics over the REDUCED frame (the full graph's dedup
        # shuffle never happens in virtual mode)
        return out.dropDuplicates()

    # -- query surface ------------------------------------------------------

    def select(self, query: str | SelectQuery) -> DataFrame:
        q = parse_sparql(query) if isinstance(query, str) else query
        cp = self._constant_projection(q)
        if cp is not None:
            return cp
        return sparql_select(self.fragment(q), q)

    def _constant_projection(self, q: SelectQuery) -> DataFrame | None:
        """§4.1 Constant Projection / Projection Pushing
        (allVarsProjectedAsConstantTermMaps,
        MorphBaseQueryTranslator.scala:398-470): a schema-exploration
        query like ``SELECT DISTINCT ?p WHERE { ?s ?p ?o } LIMIT 100``
        whose projected variable is matched only by CONSTANT term maps
        answers from the mapping alone — a literal VALUES frame, no
        source scan at all (the naive plan is a union of every triples
        map). None when the rewrite does not apply; opt-in via
        ``CompileOptions.constant_projection`` (see the option's note on
        the reference's non-empty-source assumption, which this rewrite
        shares)."""
        if not (self.options.constant_projection and q.distinct):
            return None
        if len(q.variables) != 1:
            return None
        if q.aggregates or q.group_by or q.having is not None or q.order_by:
            return None
        if q.projections:
            # (expr AS ?v) needs the expression evaluated over real
            # bindings; the mapping-only shortcut cannot compute it
            return None
        if q.from_graphs or q.from_named:
            return None
        w = q.where
        if (
            w.optionals or w.filters or w.unions or w.graphs or w.binds
            or w.values or w.exists or w.minuses or w.subselects
        ):
            return None
        # Soundness restriction: the rewrite answers from the MAPPING
        # alone, so the WHERE must not constrain solutions in any
        # data-dependent way. That holds only for a SINGLE triple
        # pattern whose other positions are distinct, otherwise-unused
        # variables (a co-pattern sharing a variable, a repeated
        # variable, or a constant subject/object all select rows — the
        # reference inspects the joined abstract query for the same
        # reason, MorphBaseQueryTranslator.scala:398-470). One certain
        # exception: a CONSTANT predicate whose bound POMs all carry
        # constant predicate maps — constant-vs-constant pruning is
        # exact, so the match is mapping-decidable (covers
        # ``SELECT DISTINCT ?t WHERE { ?s a ?t }``). Residual
        # assumption, as documented on the option: every bound source
        # is non-empty and produces at least one non-null term per map.
        if len(w.patterns) != 1:
            return None
        var = "?" + q.variables[0]
        tp = w.patterns[0]
        if isinstance(tp.p, Path):
            return None
        pos_terms = (("s", tp.s), ("p", tp.p), ("o", tp.o))
        positions = [pos for pos, t in pos_terms if t == var]
        if len(positions) != 1:
            return None  # unbound or repeated projected var
        pos = positions[0]
        const_pred = False
        other_vars: list[str] = []
        for opos, t in pos_terms:
            if opos == pos:
                continue
            if _is_var(t):
                other_vars.append(t)
            elif opos == "p":
                const_pred = True
            else:
                return None  # constant subject/object selects rows
        if len(set(other_vars)) != len(other_vars):
            return None  # repeated variable joins positions
        consts: set[str] = set()
        for tm in self.doc.triples_maps.values():
            detail = _bind_detail(tm, tp, self.options, _ANY_GRAPH)
            if detail is None:
                continue
            pruned = _detail_to_tm(tm, detail)
            if const_pred and any(
                pm.kind != CONSTANT
                for pom in pruned.predicate_object_maps
                for pm in pom.predicate_maps
            ):
                # a data-dependent predicate map *might* match the
                # constant predicate — not mapping-decidable
                return None
            got = _constant_terms_at(pruned, pos, self.options)
            if got is None:
                return None
            consts.update(got)
        schema = f"{q.variables[0]} string"
        df = (
            self.spark.createDataFrame([(c,) for c in sorted(consts)], schema)
            if consts
            else self.spark.createDataFrame([], schema)
        )
        if q.offset:
            df = df.offset(q.offset)
        if q.limit is not None:
            df = df.limit(q.limit)
        return df

    def construct(self, query: str) -> DataFrame:
        from .bgp import (
            _CONSTRUCT_RE,
            _DATASET_RE,
            _PREFIX_RE,
            _expand,
            _match_brace,
            _parse_group,
            _parse_prologue,
            _parse_triples,
        )

        prefixes = _parse_prologue(query)
        body = _PREFIX_RE.sub(
            "", re.sub(r"\bBASE\s*<[^>]*>", " ", query, flags=re.IGNORECASE)
        )
        from_graphs: list[str] = []
        from_named: list[str] = []
        mc = _CONSTRUCT_RE.search(body)
        if mc:
            for md in _DATASET_RE.finditer(mc.group("dataset") or ""):
                (from_named if md.group(1) else from_graphs).append(
                    _expand(md.group(2), prefixes)
                )
            start = body.index("{", mc.end() - 1)
            where = _parse_group(
                body[start + 1 : _match_brace(body, start)], prefixes
            )
        else:
            ms = re.search(r"CONSTRUCT\s+WHERE\s*\{", body, re.IGNORECASE)
            if not ms:
                raise ValueError("not a CONSTRUCT query")
            start = ms.end() - 1
            where = Group(
                patterns=_parse_triples(
                    body[start + 1 : _match_brace(body, start)], prefixes
                )
            )
        frag = self.fragment(
            SelectQuery(
                variables=[], where=where,
                from_graphs=from_graphs, from_named=from_named,
            )
        )
        return sparql_construct(frag, query)

    @staticmethod
    def _has_graphs(group: Group) -> bool:
        if group.graphs:
            return True
        subs = (
            group.optionals
            + [g for br in group.unions for g in br]
            + [g for _p, g in group.exists]
            + group.minuses
            + [s.where for s in group.subselects]
        )
        return any(VirtualGraph._has_graphs(g) for g in subs)

    def ask(self, query: str) -> bool:
        from .bgp import query_form

        form, text, s, e = query_form(query)
        if form == "ASK":
            # expandAsk analogue (SparqlQueryRewriter); the SELECT
            # parser treats WHERE as optional and accepts dataset
            # clauses, so the anchored keyword swap is the whole
            # rewrite (query_form skips the prologue, so an IRI
            # containing 'ask' there is never the splice point)
            query = text[:s] + "SELECT *" + text[e:]
        q = parse_sparql(query)
        q.limit = 1
        return bool(sparql_select(self.fragment(q), q).take(1))

    def describe(self, resource: str) -> DataFrame:
        """DESCRIBE <iri>, virtually: the fragment of every triple the
        resource can appear in (subject or object position) is exactly
        the description, so no other part of the graph is built."""
        iri = resource if resource.startswith("<") else f"<{resource}>"
        frag = self.fragment(
            SelectQuery(
                variables=[],
                where=Group(
                    patterns=[
                        TriplePattern(iri, "?p", "?o"),
                        TriplePattern("?s", "?p2", iri),
                    ]
                ),
            )
        )
        return frag.where(
            (F.col("subj") == F.lit(iri)) | (F.col("obj") == F.lit(iri))
        )

    def describe_where(self, query: str, max_nodes: int = 50_000) -> DataFrame:
        """``DESCRIBE ?v [?w ...] WHERE {...}``, two-phase virtual
        (expandDescribe analogue, MorphBaseQueryTranslator.scala:86-92,
        which also answers DESCRIBE without materializing):

        phase 1 — evaluate the WHERE virtually (its patterns' fragment
        only) and collect the matched resource terms, bounded by
        ``max_nodes``;
        phase 2 — compile ONLY the triples-map branches that can mention
        those resources (subject-compatible maps keep all their
        properties; otherwise just the object maps / ref-object maps
        that can produce a matched node), restricted to the nodes.

        Above the bound the node set is no longer driver-safe, so the
        evaluation falls back to the fully distributed
        materialize-then-describe path (two semi-joins). The default
        bound is 50k terms (a few MB on the driver): past _ISIN_MAX the
        phase-2 restriction is a broadcast semi-join, so large node
        sets stay cheap — measured at sf0.1 (~15k matched customers),
        two-phase runs 2-2.6x faster than the fallback it previously
        hit at the old 10k bound."""
        from .bgp import _strip_comments

        stripped = _strip_comments(query)
        m = re.search(
            r"\bDESCRIBE\s+((?:\?\w+\s*)+)WHERE\s*\{",
            stripped,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError("not a DESCRIBE ?var WHERE query")
        variables = re.findall(r"\?(\w+)", m.group(1))
        # substitute on the same comment-stripped text the detection ran
        # on — a '#' comment between the variable list and WHERE would
        # otherwise leave the DESCRIBE keyword in place and phase 1
        # would try to parse it as a SELECT
        select = re.sub(
            r"\bDESCRIBE\s+((?:\?\w+\s*)+)WHERE\b",
            "SELECT " + " ".join(f"?{v}" for v in variables) + " WHERE",
            stripped,
            count=1,
            flags=re.IGNORECASE,
        )
        bindings = self.select(select)  # phase 1: virtual
        nodes_df = bindings.select(
            F.explode(F.array(*[F.col(v) for v in variables])).alias("n")
        ).distinct()
        sample = nodes_df.take(max_nodes + 1)
        if len(sample) > max_nodes:
            comp = MappingCompiler(
                self.spark, self.doc, self.catalog, self.options
            )
            self._compilers.append(comp)
            return sparql_describe_where(comp.triples(), query)
        # literals cannot be described (they never appear as subjects,
        # and their occurrences as objects are not a resource description)
        nodes = sorted(
            {r.n for r in sample if r.n is not None and not r.n.startswith('"')}
        )
        return self._describe_nodes(nodes)

    # above this many nodes a literal isin() stops being the right
    # restriction: the expression serializes into every task and the
    # per-key scan IN-list stops helping the reader — switch to a
    # broadcast semi-join against the node set and plain scans
    _ISIN_MAX = 1024

    def _describe_nodes(self, nodes: list[str]) -> DataFrame:
        """The fragment of every triple that can mention one of
        ``nodes`` as subject or object, restricted exactly to them.

        Node-set restriction has two regimes: up to ``_ISIN_MAX`` nodes
        the exact subj/obj filter is a literal isin() and the inverted
        node KEYS push into the source scans as typed IN filters (a
        k-node DESCRIBE reads O(k) rows); above it the node set rides
        along as a broadcast frame and every restriction is a broadcast
        LEFT SEMI join (one tiny hash table per executor instead of a
        10k-element expression serialized into every task)."""
        if not nodes:
            return self.spark.createDataFrame(
                [], "subj string, pred string, obj string"
            )
        iris = [n for n in nodes if n.startswith("<")]
        has_bnode = any(n.startswith("_:") for n in nodes)
        use_keys = len(nodes) <= self._ISIN_MAX
        nodes_df = (
            None
            if use_keys
            else F.broadcast(
                self.spark.createDataFrame([(n,) for n in nodes], "n string")
            )
        )

        def node_restrict(frame: DataFrame, cols=("subj", "obj")) -> DataFrame:
            """Exact 'one of cols is a node' restriction in the regime's
            idiom; the final dropDuplicates dedups rows matched by both
            columns in the semi-join regime."""
            if use_keys:
                cond = F.col(cols[0]).isin(nodes)
                for c in cols[1:]:
                    cond = cond | F.col(c).isin(nodes)
                return frame.where(cond)
            parts = [
                frame.join(nodes_df, frame[c] == nodes_df["n"], "leftsemi")
                for c in cols
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        def om_can_produce(om) -> bool:
            if om.is_collection:
                # the chain/connecting nodes are generated blank nodes;
                # the rdf:first members follow the nested term map
                if has_bnode:
                    return True
                member_tt, _d, _l = om.member_term_info()
                return bool(iris) and member_tt not in (
                    terms.TERM_LITERAL, terms.TERM_BLANKNODE
                )
            tt = om.infer_term_type()
            if has_bnode and tt == terms.TERM_BLANKNODE:
                return True
            return any(_iri_can_match(om, n, self.options) for n in iris)

        def source_of(tm: TriplesMap) -> str | None:
            ls = tm.logical_source
            if ls.iterator:
                return None
            if ls.kind == "table":
                return ls.value
            m = _MONGO_FIND_RE.match(ls.value)
            return m.group("collection") if m else None

        def node_cond(tm: TriplesMap, table: str) -> Column | None:
            """Source filter implied by 'this map's SUBJECT is in
            nodes', when provably exact."""
            if not use_keys:
                return None  # semi-join regime: no per-key scan filter
            if tm.logical_source.kind == "table":
                try:
                    src = self.catalog._table(table)
                except Exception:  # noqa: BLE001 — unregistered
                    return None
                return _nodes_subject_pushdown(tm, nodes, src, self.options)
            doc_col = self._doc_column(table)
            if doc_col is None:
                return None
            return _doc_nodes_pushdown(tm, nodes, doc_col, self.options)

        node_set = frozenset(nodes)

        def object_branches(tm: TriplesMap) -> TriplesMap | None:
            """The TM reduced to branches whose OBJECT can be a node.
            rr:class puts the class IRI in OBJECT position
            (``?s rdf:type <cls>``), so classes that ARE matched nodes
            are kept — describing a node used as a class (DESCRIBE ?t
            WHERE { ?s rdf:type ?t }) must include its rdf:type arcs,
            same subj|obj semantics as the materialized fallback."""
            keep_classes = tuple(
                c
                for c in tm.subject_map.class_uris
                if terms.make_iri(c, False) in node_set
            )
            keep: list[PredicateObjectMap] = []
            for pom in tm.predicate_object_maps:
                if _pom_emits_collection(pom):
                    # chain/connecting nodes are generated blank nodes;
                    # rdf:first members can also be matched IRIs
                    if any(om_can_produce(om) for om in pom.object_maps):
                        keep.append(pom)
                    continue
                oms = tuple(
                    om for om in pom.object_maps if om_can_produce(om)
                )
                roms = tuple(
                    rom
                    for rom in pom.ref_object_maps
                    if any(
                        _subject_compatible(
                            self.doc.triples_maps[rom.parent_triples_map],
                            n,
                            self.options,
                        )
                        for n in nodes
                    )
                )
                if oms or roms:
                    keep.append(
                        replace(pom, object_maps=oms, ref_object_maps=roms)
                    )
            if not keep and not keep_classes:
                return None
            return replace(
                tm,
                subject_map=replace(tm.subject_map, class_uris=keep_classes),
                predicate_object_maps=tuple(keep),
            )

        def parent_filtered_catalog(pruned: TriplesMap) -> SourceCatalog:
            """Catalog with each kept RefObjectMap's PARENT source
            filtered to the node keys (the parent subject IS the
            described object, so only key-matched parent rows can join
            into a kept triple) — never the map's own source, whose
            child rows are unconstrained."""
            own = source_of(pruned)
            # parent table -> pushdown conds (None poisons the table)
            conds: dict[str, list[Column | None]] = {}
            for pom in pruned.predicate_object_maps:
                for rom in pom.ref_object_maps:
                    ptm = self.doc.triples_maps[rom.parent_triples_map]
                    ptable = source_of(ptm)
                    if ptable is None or ptable == own:
                        continue
                    conds.setdefault(ptable, []).append(
                        node_cond(ptm, ptable)
                    )
            cat = self.catalog
            for ptable, cs in conds.items():
                if any(c is None for c in cs):
                    continue
                cond = cs[0]
                for c in cs[1:]:
                    cond = cond | c
                cat = (
                    self._filtered_catalog(ptable, cond)
                    if cat is self.catalog
                    else _also_filter(cat, ptable, cond)
                )
            return cat

        def _also_filter(
            cat: SourceCatalog, table: str, cond: Column
        ) -> SourceCatalog:
            cat.tables[table] = cat._table(table).filter(cond)
            return cat

        frames: list[DataFrame] = []
        for tm in self.doc.triples_maps.values():
            subj_ok = any(
                _subject_compatible(tm, n, self.options) for n in nodes
            )
            if not subj_ok:
                pruned = object_branches(tm)
                if pruned is None:
                    continue
                frame = self._compile_tm(
                    tm.name, pruned, parent_filtered_catalog(pruned)
                )
                if frame is not None:
                    frames.append(node_restrict(frame))
                continue
            # subject-compatible: push the inverted node keys into the
            # map's own scan when provably exact — a k-node DESCRIBE
            # then scans O(k) source rows, not the table. Blank nodes
            # can't be inverted (content-derived), and a self-join ROM
            # parent reading the same table must not be starved.
            table = source_of(tm)
            cond = (
                node_cond(tm, table)
                if table is not None and not has_bnode
                else None
            )
            if cond is not None and self._rom_parent_reads(tm, table):
                cond = None
            if cond is None:
                frame = self._compile_tm(tm.name, tm, self.catalog)
                if frame is not None:
                    frames.append(node_restrict(frame))
                continue
            frame = self._compile_tm(
                tm.name, tm, self._filtered_catalog(table, cond)
            )
            if frame is not None:
                frames.append(node_restrict(frame))
            # rows whose OBJECT is a node but whose subject is not were
            # dropped by the subject-key scan filter: compile the
            # object-producing branches separately (own scan unfiltered,
            # parents key-filtered)
            pruned = object_branches(tm)
            if pruned is not None:
                frame = self._compile_tm(
                    tm.name, pruned, parent_filtered_catalog(pruned)
                )
                if frame is not None:
                    frames.append(node_restrict(frame, ("obj",)))
        if not frames:
            return self.spark.createDataFrame(
                [], "subj string, pred string, obj string"
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.dropDuplicates()

    def release(self) -> None:
        for comp in self._compilers:
            comp.release()
        self._compilers.clear()
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()
