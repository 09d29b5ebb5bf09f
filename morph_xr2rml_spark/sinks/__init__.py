from .serialize import (
    to_jsonld,
    to_turtle,
    write_ntriples,
    write_nquads,
)

__all__ = ["to_jsonld", "to_turtle", "write_ntriples", "write_nquads"]
