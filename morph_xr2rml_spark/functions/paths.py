"""Mixed-syntax-path model and evaluators.

Reimplements the reference's path machinery (morph-core
base/path/MixedSyntaxPath.scala:16-250 and the five *_PathExpression.scala
evaluators) in pure Python. These evaluators run *inside* Arrow-batched
pandas UDFs (see compiler/), never as row-at-a-time Python UDFs.

Semantics preserved:
  * A reference is a chain of typed constructors
    ``Column(...)/JSONPath(...)/XPath(...)/CSV(...)/TSV(...)``
    (constructor regexes: morph-core Constants.scala:319-338).
  * A plain reference (no constructor) is typed by the logical source's
    reference formulation (MixedSyntaxPath.scala:152-160).
  * Evaluation is a fold over the chain; each step is multi-valued
    (MixedSyntaxPath.evaluate:87-97 + recursiveEval:222-239):
    null value => [], empty-string value => [], Column head is skipped
    (the source already produced the cell).
  * JSONPath: always-return-list + suppress-exceptions (Jayway options,
    JSONPath_PathExpression.scala:23-29); non-scalar results re-serialized
    as compact JSON (:49-60); invalid path => [input].
  * XPath: NODESET evaluation; leaf => text content, element subtree =>
    one-line serialization (XPath_PathExpression.scala:49-116).
  * CSV/TSV: per-record column by integer index or header-less name —
    name lookup throws in commons-csv without a header, so any failure
    yields [] (CSV_PathExpression.scala:34-57).
"""

from __future__ import annotations

import csv as _csv
import io
import json
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Parsing (Constants.scala:319-338 regexes)
# ---------------------------------------------------------------------------

CONSTRUCTOR_NAMES = ("Column", "XPath", "JSONPath", "CSV", "TSV")

# Path-expression chars: alnum/space/most punctuation, with '/', '(', ')',
# '{', '}' requiring a backslash escape (Constants.scala:335-336).
_PATH_EXPR_CHARS = (
    r"""(?:[\w \t!#%&,\-.:;<=>?@_`|~\[\]"'*+^$]|\\/|\\\(|\\\)|\\\{|\\\})+"""
)
MIXED_SYNTAX_PATH_RE = re.compile(
    r"(Column|XPath|JSONPath|CSV|TSV)\(" + _PATH_EXPR_CHARS + r"\)"
)

_UNESCAPE_RE = re.compile(r"\\([/(){}])")


def unescape_path_chars(expr: str) -> str:
    """MixedSyntaxPath.unescapeChars: un-escape \\/ \\( \\) \\{ \\}."""
    return _UNESCAPE_RE.sub(r"\1", expr)


REFFORMULATION_COLUMN = "Column"
REFFORMULATION_JSONPATH = "JSONPath"
REFFORMULATION_XPATH = "XPath"


@dataclass(frozen=True)
class PathStep:
    kind: str  # one of CONSTRUCTOR_NAMES
    expr: str  # un-escaped path expression

    def evaluate(self, value: object) -> list[object]:
        return _EVALUATORS[self.kind](self.expr, value)


@dataclass(frozen=True)
class MixedSyntaxPath:
    raw: str
    formulation: str
    steps: tuple[PathStep, ...]

    @classmethod
    def parse(cls, raw_value: str, ref_formulation: str) -> "MixedSyntaxPath":
        """MixedSyntaxPath.apply (MixedSyntaxPath.scala:140-182)."""
        matches = list(MIXED_SYNTAX_PATH_RE.finditer(raw_value))
        if not matches:
            # Simple expression typed by the reference formulation
            kind = {
                REFFORMULATION_COLUMN: "Column",
                REFFORMULATION_XPATH: "XPath",
                REFFORMULATION_JSONPATH: "JSONPath",
            }.get(ref_formulation)
            if kind is None:
                raise ValueError(f"Unknown reference formulation: {ref_formulation}")
            steps = (PathStep(kind, raw_value),)
        else:
            steps = tuple(
                PathStep(
                    m.group(1),
                    unescape_path_chars(
                        m.group(0)[len(m.group(1)) + 1 : -1]  # strip "Kind(" ... ")"
                    ),
                )
                for m in matches
            )
        return cls(raw_value, ref_formulation, steps)

    @property
    def is_simple_column(self) -> bool:
        """True for a plain R2RML column reference (isSimpleColumnExpression)."""
        return len(self.steps) == 1 and self.steps[0].kind == "Column"

    @property
    def referenced_column(self) -> str | None:
        """For row-based sources: the source column the path starts from
        (MixedSyntaxPath.getReferencedColumn:50-67)."""
        if self.steps and self.steps[0].kind == "Column":
            return self.steps[0].expr
        return None

    def evaluate(self, value: object) -> list[object]:
        """Fold the value through the chain (evaluate:87-97).

        A leading Column step is skipped — the source engine already
        produced the cell value.
        """
        steps = self.steps
        if steps and steps[0].kind == "Column":
            steps = steps[1:]
        return _recursive_eval(value, steps)


def _recursive_eval(value: object, steps: tuple[PathStep, ...]) -> list[object]:
    """recursiveEval (MixedSyntaxPath.scala:222-239)."""
    if value is None:
        return []
    if str(value) == "":
        return []
    if not steps:
        return [value]
    current = steps[0].evaluate(value)
    if len(steps) == 1:
        return current
    out: list[object] = []
    for v in current:
        out.extend(_recursive_eval(v, steps[1:]))
    return out


# ---------------------------------------------------------------------------
# Evaluators
# ---------------------------------------------------------------------------


def _eval_column(expr: str, value: object) -> list[object]:
    """Column(...) mid-chain: identity (the DB produced the cell)."""
    return [value]


def _json_compact(value: object) -> str:
    """Compact JSON serialization matching net.minidev toJSONString."""
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


# --- JSONPath -------------------------------------------------------------
#
# Jayway semantics (the reference's engine): '.*' and '[*]' iterate BOTH
# dict values and array elements; missing paths yield nothing (SUPPRESS_
# EXCEPTIONS); '..name' is recursive descent. jsonpath_ng (the public
# Python lib) does not iterate arrays under '.*', so the common
# field/wildcard/index/descent subset is evaluated by the tokenizer below
# and jsonpath_ng.ext is only a fallback for filter/script expressions.

_JP_TOKEN_RE = re.compile(
    r"""
      \.\.(?P<ddfield>[^.\[\)]+)            # ..field (recursive descent)
    | \.\.\*                                # ..*     (descend, all)
    | \.(?P<field>[^.\[]+)                  # .field  (may contain $ letters digits _)
    | \[\s*'(?P<qfield>[^']*)'\s*\]         # ['field']
    | \[\s*"(?P<dqfield>[^"]*)"\s*\]        # ["field"]
    | \[\s*\*\s*\]                          # [*]
    | \[\s*(?P<index>-?\d+)\s*\]            # [n]
    """,
    re.VERBOSE,
)

_WILDCARD = object()
_DESCEND = object()


def _jp_tokenize(expr: str) -> list[object] | None:
    """Tokenize a simple JSONPath into field/index/wildcard/descend steps.
    Returns None when the expression uses features beyond the subset
    (filters, scripts, slices, unions) — caller falls back to jsonpath_ng."""
    e = expr.strip()
    if not e.startswith("$"):
        return None
    pos = 1
    steps: list[object] = []
    while pos < len(e):
        if e.startswith("..*", pos):
            steps.append(_DESCEND)
            steps.append(_WILDCARD)
            pos += 3
            continue
        m = _JP_TOKEN_RE.match(e, pos)
        if not m:
            return None
        if m.group("ddfield") is not None:
            f = m.group("ddfield").strip()
            if not f or any(c in f for c in "()?@"):
                return None
            steps.append(_DESCEND)
            steps.append("*" if f == "*" else f)
            if f == "*":
                steps[-1] = _WILDCARD
        elif m.group("field") is not None:
            f = m.group("field").strip()
            if any(c in f for c in "()?@"):
                return None
            steps.append(_WILDCARD if f == "*" else f)
        elif m.group("qfield") is not None:
            steps.append(m.group("qfield"))
        elif m.group("dqfield") is not None:
            steps.append(m.group("dqfield"))
        elif m.group("index") is not None:
            steps.append(int(m.group("index")))
        else:  # [*]
            steps.append(_WILDCARD)
        pos = m.end()
    return steps


def _jp_descend(node: object, out: list[object]) -> None:
    """Collect node and all descendants in document order."""
    out.append(node)
    if isinstance(node, dict):
        for v in node.values():
            _jp_descend(v, out)
    elif isinstance(node, list):
        for v in node:
            _jp_descend(v, out)


def _jp_eval_steps(doc: object, steps: list[object]) -> list[object]:
    current = [doc]
    i = 0
    while i < len(steps):
        step = steps[i]
        nxt: list[object] = []
        if step is _DESCEND:
            # pair with the following field/wildcard step
            i += 1
            target = steps[i] if i < len(steps) else _WILDCARD
            for node in current:
                pool: list[object] = []
                _jp_descend(node, pool)
                if target is _WILDCARD:
                    for p in pool:
                        if isinstance(p, dict):
                            nxt.extend(p.values())
                        elif isinstance(p, list):
                            nxt.extend(p)
                else:
                    for p in pool:
                        if isinstance(p, dict) and target in p:
                            nxt.append(p[target])
        elif step is _WILDCARD:
            for node in current:
                if isinstance(node, dict):
                    nxt.extend(node.values())
                elif isinstance(node, list):
                    nxt.extend(node)
        elif isinstance(step, int):
            for node in current:
                if isinstance(node, list) and -len(node) <= step < len(node):
                    nxt.append(node[step])
        else:  # field name
            for node in current:
                if isinstance(node, dict) and step in node:
                    nxt.append(node[step])
        current = nxt
        i += 1
    return current


def _eval_jsonpath(expr: str, value: object) -> list[object]:
    """JSONPath_PathExpression.evaluate (:37-67): always a list, missing
    path => [], invalid path => [input], non-scalar results re-serialized
    as compact JSON."""
    try:
        doc = json.loads(value) if isinstance(value, (str, bytes)) else value
    except Exception:
        return [value]

    steps = _jp_tokenize(expr)
    if steps is not None:
        found_values = _jp_eval_steps(doc, steps)
    else:
        # Fallback: filters/scripts via jsonpath_ng.ext
        import jsonpath_ng.ext as jp_ext

        try:
            compiled = _jsonpath_cache_get(expr, jp_ext)
        except Exception:
            return [value]
        try:
            found_values = [m.value for m in compiled.find(doc)]
        except Exception:
            return []

    out: list[object] = []
    for v in found_values:
        if isinstance(v, (dict, list)):
            out.append(_json_compact(v))
        else:
            out.append(v)
    return out


_JSONPATH_CACHE: dict[str, object] = {}


def _jsonpath_cache_get(expr: str, jp_ext):
    c = _JSONPATH_CACHE.get(expr)
    if c is None:
        c = jp_ext.parse(expr)
        _JSONPATH_CACHE[expr] = c
    return c


def _et_one_line(s: str) -> str:
    """XPath_PathExpression.onOneLine (:113-116)."""
    return re.sub(r">[ \t]+<", "><", s.strip().replace("\n", "").replace("\r", ""))


def _xpath_to_etree(expr: str) -> str:
    """Translate the XPath subset used by xR2RML mappings to ElementTree
    syntax: '//x' -> './/x', '/a/b' -> './a/b' (relative to root)."""
    e = expr.strip()
    if e.startswith("//"):
        return "." + e
    if e.startswith("/"):
        # ElementTree paths are relative to the root element; '/Doc/x' with
        # root 'Doc' means './x'. Drop the first segment if it names the root
        # at evaluation time — handled in _eval_xpath.
        return e
    return e


def _eval_xpath(expr: str, value: object) -> list[object]:
    """XPath_PathExpression.evaluate (:49-72) over xml.etree.

    Leaf elements yield their text content; elements with element children
    yield a one-line serialization of the subtree. Invalid XML => [input
    on one line] (mirroring the reference's fallback).
    """
    text = value if isinstance(value, str) else str(value)
    try:
        root = ET.fromstring(text)
    except Exception:
        return [_et_one_line(text)]
    e = _xpath_to_etree(expr)
    try:
        if e.startswith("/"):
            # absolute path: first segment must match root tag
            parts = [p for p in e.split("/") if p]
            if not parts or parts[0] != root.tag:
                return []
            rel = "./" + "/".join(parts[1:]) if len(parts) > 1 else "."
            nodes = [root] if rel == "." else root.findall(rel)
        else:
            nodes = root.findall(e)
    except Exception:
        return []
    out: list[object] = []
    for node in nodes:
        has_elem_children = any(True for _ in node)
        if not has_elem_children:
            # getTextContent on a leaf: concatenated text
            out.append("".join(node.itertext()))
        else:
            out.append(_et_one_line(ET.tostring(node, encoding="unicode")))
    return out


def _eval_delimited(expr: str, value: object, delimiter: str) -> list[object]:
    """CSV/TSV_PathExpression.evaluate: one element per record, column by
    integer index; non-integer names fail (no header) => []."""
    try:
        idx = int(expr)
    except ValueError:
        return []  # commons-csv get(name) without header throws => caught => []
    text = value if isinstance(value, str) else str(value)
    try:
        reader = _csv.reader(
            io.StringIO(text), delimiter=delimiter, skipinitialspace=True
        )
        out: list[object] = []
        for record in reader:
            if not record:
                continue  # ignoreEmptyLines
            cell = record[idx]  # IndexError => whole evaluation fails
            out.append(cell.rstrip())  # ignoreSurroundingSpaces trims both ends
        return out
    except Exception:
        return []


def _eval_csv(expr: str, value: object) -> list[object]:
    return _eval_delimited(expr, value, ",")


def _eval_tsv(expr: str, value: object) -> list[object]:
    return _eval_delimited(expr, value, "\t")


_EVALUATORS = {
    "Column": _eval_column,
    "JSONPath": _eval_jsonpath,
    "XPath": _eval_xpath,
    "CSV": _eval_csv,
    "TSV": _eval_tsv,
}


def simple_json_field(expr: str) -> str | None:
    """``$.a.b`` -> ``a.b`` when the reference is ONE JSONPath step of
    plain field accesses (no wildcard / descent / index / filter), i.e.
    exactly the shape Spark's ``get_json_object`` evaluates identically;
    else None. Shared by virtual-mode constant pushdown and the
    compiler's self-join-elimination guards (callers wanting ``$._id``
    rewriting apply ``rewrite_mongo_id`` first — its ``$oid`` segment is
    rejected here, as get_json_object cannot address it)."""
    msp = MixedSyntaxPath.parse(expr, "JSONPath")
    if len(msp.steps) != 1 or msp.steps[0].kind != "JSONPath":
        return None
    steps = _jp_tokenize(msp.steps[0].expr)
    if not steps:
        return None
    fields: list[str] = []
    for s in steps:
        if not isinstance(s, str) or not re.match(
            r"^[A-Za-z_][A-Za-z0-9_]*$", s
        ):
            return None
        fields.append(s)
    return ".".join(fields)
