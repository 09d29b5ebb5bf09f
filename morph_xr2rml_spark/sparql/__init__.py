from .bgp import SelectQuery, parse_sparql, sparql_select

__all__ = ["SelectQuery", "parse_sparql", "sparql_select"]
