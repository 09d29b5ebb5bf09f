"""SPARQL result serialization (S9: SELECT/ASK sinks).

The reference assembles SELECT/ASK results into XML/JSON/CSV/TSV on the
driver from a Jena result set (MorphMongoQueryProcessor.process:45-150,
MorphRDBQueryProcessor.process:50-130 + XML body :94-130). Here the
bindings live in a DataFrame of N-Triples lexical terms (one column per
variable), so:

* ``to_sparql_json`` / ``to_sparql_xml`` — driver-side strings in the
  W3C SPARQL 1.1 Results formats, for endpoint-sized results
  (``.limit()`` first for anything large);
* ``write_csv`` / ``write_tsv`` — distributed writes following the
  SPARQL 1.1 CSV/TSV conventions (CSV: plain values; TSV: full
  N-Triples terms), for bulk exports that must not pass through the
  driver;
* ``ask`` — ASK as LIMIT-1 existence (the reference rewrites ASK to
  LIMIT 1 the same way, SparqlQueryRewriter.expandAsk / O3).
"""

from __future__ import annotations

import json
import re
from xml.sax.saxutils import escape

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LITERAL_RE = re.compile(
    r'^"(?P<lex>(?:[^"\\]|\\.)*)"(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[\w-]+))?$'
)

_UNESCAPE = {
    "\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t",
}


def _unescape(lex: str) -> str:
    return re.sub(
        r"\\[\\\"nrt]", lambda m: _UNESCAPE[m.group(0)], lex
    )


def parse_term(term) -> dict | None:
    """N-Triples lexical term -> SPARQL-results binding object.

    Aggregate results (COUNT/SUM/...) come back as native numeric
    values rather than lexical terms; they serialize as typed
    literals, per the SPARQL results formats."""
    if term is None:
        return None
    if isinstance(term, bool):
        return {
            "type": "literal",
            "value": "true" if term else "false",
            "datatype": "http://www.w3.org/2001/XMLSchema#boolean",
        }
    if isinstance(term, int):
        return {
            "type": "literal",
            "value": str(term),
            "datatype": "http://www.w3.org/2001/XMLSchema#integer",
        }
    if isinstance(term, float):
        return {
            "type": "literal",
            "value": repr(term),
            "datatype": "http://www.w3.org/2001/XMLSchema#double",
        }
    if term.startswith("<") and term.endswith(">"):
        return {"type": "uri", "value": term[1:-1]}
    if term.startswith("_:"):
        return {"type": "bnode", "value": term[2:]}
    m = _LITERAL_RE.match(term)
    if m:
        out: dict = {"type": "literal", "value": _unescape(m.group("lex"))}
        if m.group("dt"):
            out["datatype"] = m.group("dt")
        if m.group("lang"):
            out["xml:lang"] = m.group("lang")
        return out
    return {"type": "literal", "value": term}


def to_sparql_json(df: DataFrame, limit: int | None = None) -> str:
    """SPARQL 1.1 Query Results JSON (driver-side)."""
    rows = (df.limit(limit) if limit is not None else df).collect()
    cols = df.columns
    bindings = []
    for row in rows:
        b = {}
        for c in cols:
            t = parse_term(row[c])
            if t is not None:
                b[c] = t
        bindings.append(b)
    return json.dumps(
        {"head": {"vars": cols}, "results": {"bindings": bindings}},
        ensure_ascii=False,
    )


def to_sparql_xml(df: DataFrame, limit: int | None = None) -> str:
    """SPARQL 1.1 Query Results XML (driver-side)."""
    rows = (df.limit(limit) if limit is not None else df).collect()
    cols = df.columns
    parts = [
        '<?xml version="1.0"?>',
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">',
        "<head>",
        *[f'<variable name="{escape(c)}"/>' for c in cols],
        "</head>",
        "<results>",
    ]
    for row in rows:
        parts.append("<result>")
        for c in cols:
            t = parse_term(row[c])
            if t is None:
                continue
            v = escape(t["value"])
            if t["type"] == "uri":
                inner = f"<uri>{v}</uri>"
            elif t["type"] == "bnode":
                inner = f"<bnode>{v}</bnode>"
            elif "datatype" in t:
                inner = f'<literal datatype="{escape(t["datatype"])}">{v}</literal>'
            elif "xml:lang" in t:
                inner = f'<literal xml:lang="{t["xml:lang"]}">{v}</literal>'
            else:
                inner = f"<literal>{v}</literal>"
            parts.append(f'<binding name="{escape(c)}">{inner}</binding>')
        parts.append("</result>")
    parts += ["</results>", "</sparql>"]
    return "".join(parts)


def _plain_value(col: Column) -> Column:
    """N-Triples term -> SPARQL-CSV plain value (IRI sans brackets,
    literal lexical form) — pure Column expressions, fully distributed."""
    iri = F.regexp_extract(col, r"^<(.*)>$", 1)
    lit = F.regexp_extract(col, r'^"((?:[^"\\]|\\.)*)"', 1)
    lit = F.replace(lit, F.lit('\\"'), F.lit('"'))
    lit = F.replace(lit, F.lit("\\\\"), F.lit("\\"))
    return (
        F.when(col.rlike("^<"), iri)
        .when(col.rlike('^"'), lit)
        .otherwise(col)
    )


def write_csv(df: DataFrame, path: str) -> None:
    """SPARQL 1.1 CSV results, written distributed."""
    df.select([_plain_value(F.col(c)).alias(c) for c in df.columns]).write.mode(
        "overwrite"
    ).option("header", True).csv(path)


def write_tsv(df: DataFrame, path: str) -> None:
    """SPARQL 1.1 TSV results (full N-Triples terms), distributed."""
    df.write.mode("overwrite").option("header", True).option(
        "sep", "\t"
    ).csv(path)


def ask(df: DataFrame) -> bool:
    """ASK semantics: does at least one binding exist (O3)."""
    return df.limit(1).count() > 0
