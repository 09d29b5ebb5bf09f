"""Minimal Turtle parser for xR2RML mapping documents.

The reference parses mapping files with Jena
(morph-xr2rml-lang R2RMLMappingDocument.scala:212-250); rdflib is not
available in this environment, so this is a hand-rolled recursive-descent
parser covering the Turtle subset that xR2RML mapping documents use:

  @prefix directives, IRIs (absolute + document-relative '<#x>'),
  prefixed names, the 'a' keyword, blank-node property lists '[ ... ]'
  (nested), ';' predicate lists, ',' object lists, '#' comments,
  single- and triple-quoted string literals with standard Turtle escapes,
  '^^' datatypes and '@' language tags, and RDF collections '( ... )'.

Produces a flat triple list over simple term types; the mapping model
builder (parser.py) then walks this graph exactly as the reference walks
the Jena model.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class IRI:
    value: str

    def __repr__(self) -> str:
        return f"<{self.value}>"


@dataclass(frozen=True)
class BNode:
    label: str

    def __repr__(self) -> str:
        return f"_:{self.label}"


@dataclass(frozen=True)
class Literal:
    value: str
    datatype: str | None = None
    language: str | None = None

    def __repr__(self) -> str:
        return f'"{self.value}"'


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_STRING_ESCAPES = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


class TurtleParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str, base: str = ""):
        self.text = text
        self.pos = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[object, IRI, object]] = []
        self._bnode_counter = 0

    # -- lexing helpers -----------------------------------------------------

    def _skip_ws(self) -> None:
        t, n = self.text, len(self.text)
        while self.pos < n:
            c = t[self.pos]
            if c in " \t\r\n":
                self.pos += 1
            elif c == "#":
                while self.pos < n and t[self.pos] != "\n":
                    self.pos += 1
            else:
                break

    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def _expect(self, s: str) -> None:
        if not self.text.startswith(s, self.pos):
            ctx = self.text[self.pos : self.pos + 40]
            raise TurtleParseError(f"expected {s!r} at {self.pos}: ...{ctx!r}")
        self.pos += len(s)

    def _new_bnode(self) -> BNode:
        self._bnode_counter += 1
        return BNode(f"b{self._bnode_counter}")

    # -- grammar ------------------------------------------------------------

    def parse(self) -> "_Parser":
        self._skip_ws()
        while self.pos < len(self.text):
            if self.text.startswith("@prefix", self.pos):
                self._parse_prefix()
            elif self.text.startswith("@base", self.pos):
                self._parse_base()
            else:
                self._parse_statement()
            self._skip_ws()
        return self

    def _parse_prefix(self) -> None:
        self._expect("@prefix")
        self._skip_ws()
        end = self.text.index(":", self.pos)
        name = self.text[self.pos : end].strip()
        self.pos = end + 1
        self._skip_ws()
        iri = self._parse_iri_ref()
        self.prefixes[name] = iri.value
        self._skip_ws()
        # Jena-lenient: real-world mappings (e.g. the reference's BSBM
        # example) omit the terminating '.' on @prefix lines
        if self.pos < len(self.text) and self.text[self.pos] == ".":
            self.pos += 1

    def _parse_base(self) -> None:
        self._expect("@base")
        self._skip_ws()
        self.base = self._parse_iri_ref().value
        self._skip_ws()
        self._expect(".")

    def _parse_statement(self) -> None:
        subject = self._parse_term(as_subject=True)
        self._skip_ws()
        self._parse_predicate_object_list(subject)
        self._skip_ws()
        self._expect(".")

    def _parse_predicate_object_list(self, subject: object) -> None:
        while True:
            self._skip_ws()
            if self._peek() in (".", "]", ""):
                return
            predicate = self._parse_predicate()
            while True:
                self._skip_ws()
                obj = self._parse_term(as_subject=False)
                self.triples.append((subject, predicate, obj))
                self._skip_ws()
                if self._peek() == ",":
                    self.pos += 1
                    continue
                break
            if self._peek() == ";":
                self.pos += 1
                continue
            return

    def _parse_predicate(self) -> IRI:
        self._skip_ws()
        if self.text.startswith("a", self.pos) and (
            self.pos + 1 >= len(self.text)
            or self.text[self.pos + 1] in " \t\r\n<["
        ):
            self.pos += 1
            return IRI(RDF_NS + "type")
        term = self._parse_term(as_subject=True)
        if not isinstance(term, IRI):
            raise TurtleParseError(f"predicate must be an IRI, got {term!r}")
        return term

    def _parse_term(self, as_subject: bool) -> object:
        self._skip_ws()
        c = self._peek()
        if c == "<":
            return self._parse_iri_ref()
        if c == "[":
            return self._parse_bnode_property_list()
        if c == "(":
            return self._parse_collection()
        if c in "\"'":
            if as_subject:
                raise TurtleParseError("literal cannot be a subject")
            return self._parse_literal()
        if c == "_" and self.text.startswith("_:", self.pos):
            self.pos += 2
            start = self.pos
            while self._peek() and self._peek() not in " \t\r\n;,.)]":
                self.pos += 1
            return BNode(self.text[start : self.pos])
        if c and (c.isdigit() or c in "+-"):
            return self._parse_numeric()
        if self.text.startswith("true", self.pos) or self.text.startswith(
            "false", self.pos
        ):
            return self._parse_boolean_or_pname()
        return self._parse_prefixed_name()

    def _parse_iri_ref(self) -> IRI:
        self._expect("<")
        end = self.text.index(">", self.pos)
        raw = self.text[self.pos : end]
        self.pos = end + 1
        if raw.startswith("#"):
            return IRI(self.base + raw)
        if "://" not in raw and not raw.startswith(("urn:", "mailto:")) and self.base:
            return IRI(self.base + raw)
        return IRI(raw)

    def _parse_bnode_property_list(self) -> BNode:
        self._expect("[")
        node = self._new_bnode()
        self._skip_ws()
        if self._peek() != "]":
            self._parse_predicate_object_list(node)
        self._skip_ws()
        self._expect("]")
        return node

    def _parse_collection(self) -> object:
        self._expect("(")
        items = []
        while True:
            self._skip_ws()
            if self._peek() == ")":
                self.pos += 1
                break
            items.append(self._parse_term(as_subject=False))
        head: object = IRI(RDF_NS + "nil")
        for item in reversed(items):
            cell = self._new_bnode()
            self.triples.append((cell, IRI(RDF_NS + "first"), item))
            self.triples.append((cell, IRI(RDF_NS + "rest"), head))
            head = cell
        return head

    def _parse_literal(self) -> Literal:
        quote = self._peek()
        triple = self.text.startswith(quote * 3, self.pos)
        delim = quote * 3 if triple else quote
        self.pos += len(delim)
        buf: list[str] = []
        t, n = self.text, len(self.text)
        while self.pos < n:
            if t.startswith(delim, self.pos):
                self.pos += len(delim)
                break
            c = t[self.pos]
            if c == "\\":
                self.pos += 1
                e = t[self.pos]
                if e == "u":
                    buf.append(chr(int(t[self.pos + 1 : self.pos + 5], 16)))
                    self.pos += 5
                    continue
                if e == "U":
                    buf.append(chr(int(t[self.pos + 1 : self.pos + 9], 16)))
                    self.pos += 9
                    continue
                buf.append(_STRING_ESCAPES.get(e, "\\" + e))
                self.pos += 1
            else:
                buf.append(c)
                self.pos += 1
        else:
            raise TurtleParseError("unterminated string literal")
        value = "".join(buf)
        datatype = None
        language = None
        if self.text.startswith("^^", self.pos):
            self.pos += 2
            dt = self._parse_term(as_subject=True)
            datatype = dt.value if isinstance(dt, IRI) else str(dt)
        elif self._peek() == "@":
            self.pos += 1
            start = self.pos
            while self._peek() and (self._peek().isalnum() or self._peek() == "-"):
                self.pos += 1
            language = self.text[start : self.pos]
        return Literal(value, datatype, language)

    def _parse_numeric(self) -> Literal:
        start = self.pos
        while self._peek() and self._peek() in "+-0123456789.eE":
            self.pos += 1
        raw = self.text[start : self.pos]
        xsd = "http://www.w3.org/2001/XMLSchema#"
        if "." in raw or "e" in raw or "E" in raw:
            return Literal(raw, xsd + "decimal")
        return Literal(raw, xsd + "integer")

    def _parse_boolean_or_pname(self) -> object:
        for kw in ("true", "false"):
            if self.text.startswith(kw, self.pos):
                after = (
                    self.text[self.pos + len(kw)]
                    if self.pos + len(kw) < len(self.text)
                    else " "
                )
                if after in " \t\r\n;,.)]":
                    self.pos += len(kw)
                    return Literal(kw, "http://www.w3.org/2001/XMLSchema#boolean")
        return self._parse_prefixed_name()

    def _parse_prefixed_name(self) -> IRI:
        start = self.pos
        while self._peek() and self._peek() not in " \t\r\n;,)]":
            if self._peek() == ".":
                # '.' ends a statement unless followed by a name char
                nxt = (
                    self.text[self.pos + 1] if self.pos + 1 < len(self.text) else " "
                )
                if nxt in " \t\r\n" or nxt == "":
                    break
            self.pos += 1
        raw = self.text[start : self.pos]
        if ":" not in raw:
            raise TurtleParseError(f"not a prefixed name: {raw!r} at {start}")
        prefix, local = raw.split(":", 1)
        if prefix not in self.prefixes:
            raise TurtleParseError(f"unknown prefix {prefix!r} in {raw!r}")
        return IRI(self.prefixes[prefix] + local)


def parse_turtle(
    text: str, base: str = ""
) -> tuple[list[tuple[object, IRI, object]], dict[str, str]]:
    """Parse a Turtle document, returning (triples, prefix map)."""
    p = _Parser(text, base).parse()
    return p.triples, p.prefixes
