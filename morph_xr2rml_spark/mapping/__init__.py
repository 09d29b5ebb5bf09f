from .model import (  # noqa: F401
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
from .parser import parse_mapping  # noqa: F401
