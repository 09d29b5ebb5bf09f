"""xR2RML mapping-language model.

Python dataclass mirror of the reference's mapping model
(morph-xr2rml-lang: R2RMLMappingDocument.scala, R2RMLTriplesMap.scala:15-20,
R2RMLTermMap.scala, R2RMLSubjectMap.scala:12-28, R2RMLPredicateObjectMap,
R2RMLRefObjectMap.scala:12-36, xR2RMLLogicalSource.scala:26-30,
xR2RMLNestedTermMap.scala:15-21).

The whole document is a small driver-side tree — it is compiled once into
Spark DataFrame plans and (when UDFs need it) shipped to executors inside
closure captures; it never holds data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions import terms
from ..functions.paths import MixedSyntaxPath
from ..functions.templates import get_template_groups

# Namespaces
RR = "http://www.w3.org/ns/r2rml#"
XRR = "http://i3s.unice.fr/xr2rml#"
RML = "http://semweb.mmlab.be/ns/rml#"

# Term map kinds (Constants.MorphTermMapType, morph-core Constants.scala:16-19)
CONSTANT = "constant"
COLUMN = "column"
TEMPLATE = "template"
REFERENCE = "reference"


@dataclass(frozen=True)
class LogicalSource:
    """xR2RMLLogicalSource (xR2RMLLogicalSource.scala:26-30).

    kind: 'table' (rr:tableName) or 'query' (rr:sqlQuery / xrr:query).
    formulation: Column | JSONPath | XPath (Constants.scala:288-292).
    iterator: rml:iterator — only honored for non-Column formulations
    (xR2RMLLogicalSource.scala:161-173: iterator ignored on tables).
    unique_refs: xrr:uniqueRef declarations (self-join elimination keys).
    """

    kind: str
    value: str
    formulation: str = "Column"
    iterator: str | None = None
    unique_refs: tuple[str, ...] = ()


@dataclass(frozen=True)
class NestedTermMap:
    """xR2RMLNestedTermMap (simple form): term type/datatype/language of
    collection members (xR2RMLNestedTermMap.scala:15-21, default :52-59)."""

    term_type: str | None = None
    datatype: str | None = None
    language: str | None = None

    def infer_term_type(self) -> str:
        # default for nested term maps is Literal (:52-59)
        return self.term_type or terms.TERM_LITERAL


@dataclass(frozen=True)
class TermMap:
    """R2RMLTermMap: exactly one of constant/column/template/reference
    (type decision R2RMLTermMap.scala:49-80, :269-286)."""

    kind: str  # CONSTANT | COLUMN | TEMPLATE | REFERENCE
    position: str  # 'subject' | 'predicate' | 'object' | 'graph'
    constant: str | None = None
    column: str | None = None
    template: str | None = None
    reference: str | None = None
    term_type: str | None = None
    datatype: str | None = None
    language: str | None = None
    nested: NestedTermMap | None = None
    ref_formulation: str = "Column"

    def infer_term_type(self) -> str:
        """R2RMLTermMap.inferTermType / getDefaultTermType (:85-112)."""
        if self.term_type:
            return self.term_type
        if self.position == "object":
            if (
                self.kind in (COLUMN, REFERENCE)
                or self.language is not None
                or self.datatype is not None
            ):
                return terms.TERM_LITERAL
            return terms.TERM_IRI
        return terms.TERM_IRI

    @property
    def is_collection(self) -> bool:
        return self.infer_term_type() in terms.COLLECTION_TERM_TYPES

    def member_term_info(self) -> tuple[str, str | None, str | None]:
        """(member term type, datatype, language) accounting for collection
        term types + nested term maps (MorphMongoDataTranslator.scala:253-265)."""
        if self.is_collection:
            if self.nested is not None:
                return (
                    self.nested.infer_term_type(),
                    self.nested.datatype,
                    self.nested.language,
                )
            return (terms.TERM_LITERAL, None, None)
        return (self.infer_term_type(), self.datatype, self.language)

    def collection_term_type(self) -> str | None:
        tt = self.infer_term_type()
        return tt if tt in terms.COLLECTION_TERM_TYPES else None

    def referenced_columns(self) -> list[str]:
        """Source columns this term map reads (for column pruning —
        MorphRDBUnfolder.unfoldTermMap:105-183 analogue)."""
        if self.kind == COLUMN:
            return [self.column]
        if self.kind == REFERENCE:
            if self.ref_formulation == "Column":
                msp = MixedSyntaxPath.parse(self.reference, self.ref_formulation)
                col = msp.referenced_column
                return [col] if col else []
            return []
        if self.kind == TEMPLATE:
            cols = []
            for group in get_template_groups(self.template):
                if self.ref_formulation == "Column":
                    msp = MixedSyntaxPath.parse(group, self.ref_formulation)
                    if msp.referenced_column:
                        cols.append(msp.referenced_column)
            return cols
        return []


@dataclass(frozen=True)
class SubjectMap(TermMap):
    """R2RMLSubjectMap: term map + rr:class URIs + graph maps
    (R2RMLSubjectMap.scala:12-28)."""

    class_uris: tuple[str, ...] = ()
    graph_maps: tuple[TermMap, ...] = ()


@dataclass(frozen=True)
class JoinCondition:
    """R2RMLJoinCondition (R2RMLJoinCondition.scala:10)."""

    child_ref: str
    parent_ref: str


@dataclass(frozen=True)
class RefObjectMap:
    """R2RMLRefObjectMap (R2RMLRefObjectMap.scala:12-36): parent triples map
    + join conditions + optional collection term type."""

    parent_triples_map: str
    join_conditions: tuple[JoinCondition, ...] = ()
    term_type: str | None = None  # optional xrr:RdfList/Bag/Seq/Alt

    def collection_term_type(self) -> str | None:
        if self.term_type in terms.COLLECTION_TERM_TYPES:
            return self.term_type
        return None


@dataclass(frozen=True)
class PredicateObjectMap:
    predicate_maps: tuple[TermMap, ...] = ()
    object_maps: tuple[TermMap, ...] = ()
    ref_object_maps: tuple[RefObjectMap, ...] = ()
    graph_maps: tuple[TermMap, ...] = ()


@dataclass(frozen=True)
class TriplesMap:
    """R2RMLTriplesMap (R2RMLTriplesMap.scala:15-20)."""

    name: str
    logical_source: LogicalSource
    subject_map: SubjectMap
    predicate_object_maps: tuple[PredicateObjectMap, ...] = ()


@dataclass
class MappingDocument:
    """R2RMLMappingDocument (R2RMLMappingDocument.scala:19-22)."""

    triples_maps: dict[str, TriplesMap] = field(default_factory=dict)
    prefixes: dict[str, str] = field(default_factory=dict)

    def get(self, name: str) -> TriplesMap:
        return self.triples_maps[name]
