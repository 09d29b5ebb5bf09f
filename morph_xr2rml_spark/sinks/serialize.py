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
* ``to_turtle`` / ``to_n3`` / ``to_jsonld`` / ``to_rdfxml`` —
  driver-side strings with prefix compaction / value typing, for
  example-suite-sized graphs (the same scope the reference's
  driver-memory serializer handled). All take a ``limit`` guard
  against accidental full-graph collects. That completes the
  reference's format list (RDF/XML, N-TRIPLE, TURTLE, N3, JSON-LD;
  Constants.scala:94-102).
"""

from __future__ import annotations

import json
import re
from xml.sax.saxutils import escape, quoteattr

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


def to_n3(
    triples: DataFrame,
    prefixes: dict[str, str] | None = None,
    limit: int = _DEFAULT_LIMIT,
) -> str:
    """Notation3 (driver-side, size-guarded). The graphs this engine
    emits use no N3-only constructs, so the output is the Turtle
    serialization, which is a valid N3 document — the same relationship
    Jena's N3 writer has to its Turtle writer in the reference."""
    return to_turtle(triples, prefixes, limit)


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_NCNAME_RE = re.compile(r"^[A-Za-z_][\w.-]*$")


def _split_qname(iri: str) -> tuple[str, str]:
    """Split an IRI into (namespace, NCName local part) for an RDF/XML
    property element, at the last #, / or : whose suffix is a name."""
    for i in range(len(iri) - 1, -1, -1):
        if iri[i] in "#/:":
            local = iri[i + 1 :]
            if local and _NCNAME_RE.match(local):
                return iri[: i + 1], local
            break
    raise ValueError(f"cannot form an XML QName from predicate IRI {iri!r}")


def to_rdfxml(triples: DataFrame, limit: int = _DEFAULT_LIMIT) -> str:
    """RDF/XML (driver-side, size-guarded): one rdf:Description per
    subject, predicate namespaces auto-declared as ns1, ns2, ..."""
    rows = triples.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"graph exceeds {limit} triples; use write_ntriples for bulk"
        )
    ns_of: dict[str, str] = {_RDF_NS: "rdf"}

    def qname(iri: str) -> str:
        ns, local = _split_qname(iri)
        if ns not in ns_of:
            ns_of[ns] = f"ns{len(ns_of)}"
        return f"{ns_of[ns]}:{local}"

    body: list[str] = []
    by_subj: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["subj"], r["pred"], r["obj"])):
        by_subj.setdefault(r["subj"], []).append(r)
    for subj, srows in by_subj.items():
        s = parse_term(subj)
        if s["type"] == "bnode":
            body.append(f"  <rdf:Description rdf:nodeID={quoteattr(s['value'])}>")
        else:
            body.append(f"  <rdf:Description rdf:about={quoteattr(s['value'])}>")
        for r in srows:
            p = qname(parse_term(r["pred"])["value"])
            o = parse_term(r["obj"])
            if o["type"] == "uri":
                body.append(f"    <{p} rdf:resource={quoteattr(o['value'])}/>")
            elif o["type"] == "bnode":
                body.append(f"    <{p} rdf:nodeID={quoteattr(o['value'])}/>")
            else:
                attrs = ""
                if "datatype" in o:
                    attrs = f" rdf:datatype={quoteattr(o['datatype'])}"
                elif "xml:lang" in o:
                    attrs = f" xml:lang={quoteattr(o['xml:lang'])}"
                body.append(f"    <{p}{attrs}>{escape(o['value'])}</{p}>")
        body.append("  </rdf:Description>")
    decls = " ".join(
        f"xmlns:{pfx}={quoteattr(ns)}" for ns, pfx in ns_of.items()
    )
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        + f"<rdf:RDF {decls}>\n"
        + "\n".join(body)
        + "\n</rdf:RDF>\n"
    )
