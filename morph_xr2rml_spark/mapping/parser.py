"""xR2RML mapping-document parser: Turtle text -> MappingDocument.

Walks the parsed triple graph the same way the reference walks its Jena
model (morph-xr2rml-lang R2RMLMappingDocument.scala:212-298 and
R2RMLTermMap.scala:375-453 for shortcut vs long forms)."""

from __future__ import annotations

from collections import defaultdict

from .model import (
    COLUMN,
    CONSTANT,
    REFERENCE,
    RML,
    RR,
    TEMPLATE,
    XRR,
    JoinCondition,
    LogicalSource,
    MappingDocument,
    NestedTermMap,
    PredicateObjectMap,
    RefObjectMap,
    SubjectMap,
    TermMap,
    TriplesMap,
)
from .turtle import RDF_NS, BNode, IRI, Literal, parse_turtle

_FORMULATION_BY_IRI = {
    XRR + "Column": "Column",
    XRR + "JSONPath": "JSONPath",
    XRR + "XPath": "XPath",
}


class _Graph:
    def __init__(self, triples):
        self._spo = defaultdict(lambda: defaultdict(list))
        for s, p, o in triples:
            self._spo[s][p.value].append(o)
        self.triples = triples

    def objects(self, subject, predicate: str) -> list:
        return self._spo[subject][predicate]

    def one(self, subject, predicate: str):
        objs = self.objects(subject, predicate)
        return objs[0] if objs else None

    def subjects_with(self, *predicates: str) -> list:
        out = []
        seen = set()
        for s in self._spo:
            key = repr(s)
            if key in seen:
                continue
            if any(self._spo[s][p] for p in predicates):
                seen.add(key)
                out.append(s)
        return out


def _lit(value) -> str | None:
    if value is None:
        return None
    if isinstance(value, Literal):
        return value.value
    if isinstance(value, IRI):
        return value.value
    raise ValueError(f"expected literal/IRI, got {value!r}")


def parse_mapping(
    text: str, base: str = "", default_formulation: str = "Column"
) -> MappingDocument:
    """default_formulation mirrors the reference's per-database
    ``database.reference_formulation`` config (MorphProperties) applied when
    the logical source declares no xrr:referenceFormulation."""
    triples, prefixes = parse_turtle(text, base)
    g = _Graph(triples)

    # TriplesMap inference: any subject with rr:logicalTable or
    # xrr:logicalSource (R2RMLMappingDocument.scala:286-298)
    tm_nodes = g.subjects_with(RR + "logicalTable", XRR + "logicalSource")

    doc = MappingDocument(prefixes=prefixes)
    for node in tm_nodes:
        name = node.value if isinstance(node, IRI) else repr(node)
        ls = _parse_logical_source(g, node, default_formulation)
        sm = _parse_subject_map(g, node, ls)
        poms = tuple(
            _parse_pom(g, pom_node, ls)
            for pom_node in g.objects(node, RR + "predicateObjectMap")
        )
        doc.triples_maps[name] = TriplesMap(name, ls, sm, poms)
    return doc


def _parse_logical_source(
    g: _Graph, tm_node, default_formulation: str = "Column"
) -> LogicalSource:
    """xR2RMLLogicalSource.parse (:65-149)."""
    ls_node = g.one(tm_node, XRR + "logicalSource") or g.one(
        tm_node, RR + "logicalTable"
    )
    if ls_node is None:
        raise ValueError(f"triples map {tm_node!r} has no logical source")

    table = g.one(ls_node, RR + "tableName")
    query = (
        g.one(ls_node, RR + "sqlQuery")
        or g.one(ls_node, XRR + "query")
        or g.one(ls_node, RML + "query")
    )
    if table is not None:
        kind, value = "table", _lit(table)
    elif query is not None:
        kind, value = "query", _lit(query).strip()
    else:
        raise ValueError(f"logical source of {tm_node!r} has neither table nor query")

    form_node = g.one(ls_node, XRR + "referenceFormulation")
    if form_node is None:
        formulation = default_formulation
    elif isinstance(form_node, IRI):
        formulation = _FORMULATION_BY_IRI.get(form_node.value, "Column")
    else:
        formulation = _lit(form_node)

    iterator = _lit(g.one(ls_node, RML + "iterator"))
    # Iterator is ignored for row-based (Column) sources
    # (xR2RMLLogicalSource.scala:161-173 logs a warning and drops it).
    if formulation == "Column":
        iterator = None

    unique_refs = tuple(_lit(u) for u in g.objects(ls_node, XRR + "uniqueRef"))
    return LogicalSource(kind, value, formulation, iterator, unique_refs)


def _term_map_fields(g: _Graph, node, position: str, ls: LogicalSource) -> dict:
    """Extract the 4-way constant/column/template/reference choice + term
    typing attributes (R2RMLTermMap.scala:49-80, :269-286)."""
    constant = g.one(node, RR + "constant")
    column = g.one(node, RR + "column")
    template = g.one(node, RR + "template")
    reference = g.one(node, XRR + "reference") or g.one(node, RML + "reference")

    term_type_node = g.one(node, RR + "termType")
    term_type = term_type_node.value if isinstance(term_type_node, IRI) else None
    datatype_node = g.one(node, RR + "datatype")
    datatype = datatype_node.value if isinstance(datatype_node, IRI) else None
    language = _lit(g.one(node, RR + "language"))

    nested = None
    nested_node = g.one(node, XRR + "nestedTermMap")
    if nested_node is not None:
        ntt_node = g.one(nested_node, RR + "termType")
        ndt_node = g.one(nested_node, RR + "datatype")
        nested = NestedTermMap(
            term_type=ntt_node.value if isinstance(ntt_node, IRI) else None,
            datatype=ndt_node.value if isinstance(ndt_node, IRI) else None,
            language=_lit(g.one(nested_node, RR + "language")),
        )

    if constant is not None:
        kind = CONSTANT
        const_value = constant.value if isinstance(constant, IRI) else constant.value
        if term_type is None and isinstance(constant, IRI):
            term_type = RR + "IRI"
        if term_type is None and isinstance(constant, Literal):
            term_type = RR + "Literal"
            datatype = datatype or constant.datatype
            language = language or constant.language
        return dict(
            kind=kind,
            position=position,
            constant=const_value,
            term_type=term_type,
            datatype=datatype,
            language=language,
            nested=nested,
            ref_formulation=ls.formulation,
        )
    if column is not None:
        return dict(
            kind=COLUMN,
            position=position,
            column=_lit(column),
            term_type=term_type,
            datatype=datatype,
            language=language,
            nested=nested,
            ref_formulation=ls.formulation,
        )
    if template is not None:
        return dict(
            kind=TEMPLATE,
            position=position,
            template=_lit(template),
            term_type=term_type,
            datatype=datatype,
            language=language,
            nested=nested,
            ref_formulation=ls.formulation,
        )
    if reference is not None:
        return dict(
            kind=REFERENCE,
            position=position,
            reference=_lit(reference),
            term_type=term_type,
            datatype=datatype,
            language=language,
            nested=nested,
            ref_formulation=ls.formulation,
        )
    raise ValueError(
        f"term map {node!r} has none of rr:constant/rr:column/rr:template/xrr:reference"
    )


def _constant_term_map(obj, position: str, ls: LogicalSource) -> TermMap:
    """Shortcut forms rr:subject / rr:predicate / rr:object / rr:graph
    (R2RMLTermMap.scala:375-453)."""
    if isinstance(obj, IRI):
        return TermMap(
            kind=CONSTANT,
            position=position,
            constant=obj.value,
            term_type=RR + "IRI",
            ref_formulation=ls.formulation,
        )
    return TermMap(
        kind=CONSTANT,
        position=position,
        constant=obj.value,
        term_type=RR + "Literal",
        datatype=obj.datatype,
        language=obj.language,
        ref_formulation=ls.formulation,
    )


def _parse_graph_maps(g: _Graph, node, ls: LogicalSource) -> tuple[TermMap, ...]:
    out = []
    for short in g.objects(node, RR + "graph"):
        out.append(_constant_term_map(short, "graph", ls))
    for gm_node in g.objects(node, RR + "graphMap"):
        out.append(TermMap(**_term_map_fields(g, gm_node, "graph", ls)))
    # rr:defaultGraph means "no named graph" — drop it
    return tuple(
        gm
        for gm in out
        if gm.constant != RR + "defaultGraph"
    )


def _parse_subject_map(g: _Graph, tm_node, ls: LogicalSource) -> SubjectMap:
    sm_node = g.one(tm_node, RR + "subjectMap")
    if sm_node is not None:
        fields = _term_map_fields(g, sm_node, "subject", ls)
        class_uris = tuple(
            c.value for c in g.objects(sm_node, RR + "class") if isinstance(c, IRI)
        )
        graph_maps = _parse_graph_maps(g, sm_node, ls)
        return SubjectMap(**fields, class_uris=class_uris, graph_maps=graph_maps)
    short = g.one(tm_node, RR + "subject")
    if short is None:
        raise ValueError(f"triples map {tm_node!r} has no subject map")
    base = _constant_term_map(short, "subject", ls)
    return SubjectMap(
        kind=base.kind,
        position=base.position,
        constant=base.constant,
        term_type=base.term_type,
        ref_formulation=base.ref_formulation,
    )


def _parse_pom(g: _Graph, pom_node, ls: LogicalSource) -> PredicateObjectMap:
    predicate_maps = [
        _constant_term_map(o, "predicate", ls)
        for o in g.objects(pom_node, RR + "predicate")
    ]
    predicate_maps += [
        TermMap(**_term_map_fields(g, n, "predicate", ls))
        for n in g.objects(pom_node, RR + "predicateMap")
    ]

    object_maps: list[TermMap] = []
    ref_object_maps: list[RefObjectMap] = []
    for o in g.objects(pom_node, RR + "object"):
        object_maps.append(_constant_term_map(o, "object", ls))
    om_nodes = list(g.objects(pom_node, RR + "objectMap")) + list(
        g.objects(pom_node, RR + "refObjectMap")
    )
    for n in om_nodes:
        parent = g.one(n, RR + "parentTriplesMap")
        if parent is not None:
            # RefObjectMap (R2RMLRefObjectMap.scala:42-63)
            joins = []
            for jc_node in g.objects(n, RR + "joinCondition"):
                joins.append(
                    JoinCondition(
                        child_ref=_lit(g.one(jc_node, RR + "child")),
                        parent_ref=_lit(g.one(jc_node, RR + "parent")),
                    )
                )
            tt_node = g.one(n, RR + "termType")
            ref_object_maps.append(
                RefObjectMap(
                    parent_triples_map=parent.value
                    if isinstance(parent, IRI)
                    else repr(parent),
                    join_conditions=tuple(joins),
                    term_type=tt_node.value if isinstance(tt_node, IRI) else None,
                )
            )
        else:
            object_maps.append(TermMap(**_term_map_fields(g, n, "object", ls)))

    graph_maps = _parse_graph_maps(g, pom_node, ls)
    return PredicateObjectMap(
        predicate_maps=tuple(predicate_maps),
        object_maps=tuple(object_maps),
        ref_object_maps=tuple(ref_object_maps),
        graph_maps=graph_maps,
    )
