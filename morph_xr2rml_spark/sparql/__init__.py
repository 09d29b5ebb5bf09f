from .bgp import (
    SelectQuery,
    parse_sparql,
    sparql_construct,
    sparql_describe,
    sparql_describe_where,
    sparql_select,
)
from .results import ask, parse_term, to_sparql_json, to_sparql_xml, write_csv, write_tsv
from .virtual import VirtualGraph, bind_patterns

__all__ = [
    "SelectQuery",
    "VirtualGraph",
    "ask",
    "bind_patterns",
    "parse_sparql",
    "parse_term",
    "sparql_construct",
    "sparql_describe",
    "sparql_describe_where",
    "sparql_select",
    "to_sparql_json",
    "to_sparql_xml",
    "write_csv",
    "write_tsv",
]
