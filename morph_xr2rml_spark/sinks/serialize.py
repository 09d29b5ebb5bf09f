"""RDF sinks (S7): serialize the triple/quad DataFrames.

The reference serializes its in-driver Jena model to RDF/XML, N-TRIPLE,
TURTLE, N3 or JSON-LD at the end of materialization
(MorphBaseMaterializer.serialize:37-68; formats Constants.scala:94-102)
— which forces the whole graph into driver memory
(README_code_architecture.md:98-101). Here the canonical sink is the
partitioned columnar (subj, pred, obj) table itself; these serializers
cover interchange:

* ``write_ntriples`` / ``write_nquads`` — fully distributed line
  formats (terms are already N-Triples lexical strings, so a line is
  just ``s p o .``); any graph size.
* ``to_turtle`` / ``to_jsonld`` — driver-side strings with prefix
  compaction / value typing, for example-suite-sized graphs (the same
  scope the reference's driver-memory serializer handled). Both take a
  ``limit`` guard against accidental full-graph collects.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sparql.results import parse_term

_DEFAULT_LIMIT = 100_000


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Distributed N-Triples: one ``subj pred obj .`` line per triple."""
    (
        triples.select(
            F.concat_ws(" ", "subj", "pred", "obj", F.lit(".")).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


def write_nquads(quads: DataFrame, path: str) -> None:
    """Distributed N-Quads; NULL graph = default graph (triple line)."""
    line = F.when(
        F.col("graph").isNotNull(),
        F.concat_ws(" ", "subj", "pred", "obj", "graph", F.lit(".")),
    ).otherwise(F.concat_ws(" ", "subj", "pred", "obj", F.lit(".")))
    quads.select(line.alias("value")).write.mode("overwrite").text(path)


def _compact(iri_term: str, prefixes: dict[str, str]) -> str:
    """<iri> -> prefix:local when a prefix matches, else unchanged."""
    iri = iri_term[1:-1]
    for pfx, ns in prefixes.items():
        if iri.startswith(ns):
            local = iri[len(ns):]
            if local and all(c.isalnum() or c in "_-." for c in local):
                return f"{pfx}:{local}"
    return iri_term


def to_turtle(
    triples: DataFrame,
    prefixes: dict[str, str] | None = None,
    limit: int = _DEFAULT_LIMIT,
) -> str:
    """Turtle with prefix compaction and subject/predicate grouping
    (driver-side; raises if the graph exceeds ``limit`` triples)."""
    rows = triples.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"graph exceeds {limit} triples; use write_ntriples for bulk"
        )
    prefixes = prefixes or {}
    out = [f"@prefix {p}: <{ns}> ." for p, ns in prefixes.items()]
    if out:
        out.append("")

    by_subj: dict[str, dict[str, list[str]]] = {}
    for r in sorted(rows, key=lambda r: (r["subj"], r["pred"], r["obj"])):
        by_subj.setdefault(r["subj"], {}).setdefault(r["pred"], []).append(
            r["obj"]
        )
    for subj, preds in by_subj.items():
        lines = []
        for pred, objs in preds.items():
            p = (
                "a"
                if pred == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
                else _compact(pred, prefixes)
            )
            o = ", ".join(
                _compact(o, prefixes) if o.startswith("<") else o for o in objs
            )
            lines.append(f"    {p} {o}")
        out.append(_compact(subj, prefixes) + "\n" + " ;\n".join(lines) + " .")
    return "\n".join(out) + "\n"


def to_jsonld(triples: DataFrame, limit: int = _DEFAULT_LIMIT) -> str:
    """Expanded-form JSON-LD (driver-side, size-guarded)."""
    rows = triples.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"graph exceeds {limit} triples; use write_ntriples for bulk"
        )
    nodes: dict[str, dict] = {}
    for r in sorted(rows, key=lambda r: (r["subj"], r["pred"], r["obj"])):
        subj = parse_term(r["subj"])
        sid = ("_:" + subj["value"]) if subj["type"] == "bnode" else subj["value"]
        node = nodes.setdefault(sid, {"@id": sid})
        pred = parse_term(r["pred"])["value"]
        obj = parse_term(r["obj"])
        if pred == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type":
            node.setdefault("@type", []).append(obj["value"])
            continue
        if obj["type"] == "uri":
            val: object = {"@id": obj["value"]}
        elif obj["type"] == "bnode":
            val = {"@id": "_:" + obj["value"]}
        else:
            val = {"@value": obj["value"]}
            if "datatype" in obj:
                val["@type"] = obj["datatype"]
            if "xml:lang" in obj:
                val["@language"] = obj["xml:lang"]
        node.setdefault(pred, []).append(val)
    return json.dumps(list(nodes.values()), ensure_ascii=False, indent=2)
