from .serialize import (
    to_jsonld,
    to_turtle,
    write_ntriples,
    write_nquads,
)
from .table import read_triples_table, write_bucketed_triples

__all__ = [
    "to_jsonld",
    "to_turtle",
    "write_ntriples",
    "write_nquads",
    "read_triples_table",
    "write_bucketed_triples",
]
