"""RDF term model — N-Triples lexical encoding.

The reference keeps terms as Jena objects in driver memory
(morph-core RDFTerm.scala / RDFTermIRI.scala / RDFTermLiteral.scala /
RDFTermBlankNode.scala) and serializes at the end. A distributed engine
cannot hold the graph on the driver, so terms are encoded *eagerly* as
N-Triples lexical strings inside DataFrame columns:

    IRI          <http://example.org/x>
    literal      "v"            plain
                 "v"^^<dt>      typed
                 "v"@lang       language-tagged
    blank node   _:label

The triple output schema everywhere is (subj: string, pred: string,
obj: string) — the north rule's partitioned (subj, pred, obj) table.

Term-construction semantics follow MorphBaseDataTranslator
(morph-base MorphBaseDataTranslator.scala:184-320):
  * createIRI (:236-242): encodeURI(trim) then, if the encode-unsafe flag is
    set (default true, MorphProperties.scala:45), encodeUrl.
  * createLiteral (:249-274): emits the RAW value — the method computes
    encodeLiteral + dateTime/boolean conversion but discards both,
    constructing RDFTermLiteral from the original value (:267) that
    createLiteralNode (:86-93) hands to Jena unchanged; the reference's
    recorded e2e outputs confirm it (tests/test_dblp_suite.py replay).
  * null DB value => no term (translateMultipleValues :216-231).

Datatype inference: the RDB path maps java.sql.Types to XSD
(morph-base/sql/DatatypeMapper.scala:12-28); we map Spark DataTypes the
same way at compile time (CHAR/VARCHAR intentionally unmapped -> plain
literal, as in the reference where Types.CHAR is commented out).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import encoding

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATE = XSD + "date"
XSD_TIME = XSD + "time"
XSD_DATETIME = XSD + "dateTime"
XSD_STRING = XSD + "string"
XSD_HEXBINARY = XSD + "hexBinary"

# Term types (morph-core Constants.scala:231-245)
TERM_IRI = "http://www.w3.org/ns/r2rml#IRI"
TERM_LITERAL = "http://www.w3.org/ns/r2rml#Literal"
TERM_BLANKNODE = "http://www.w3.org/ns/r2rml#BlankNode"
TERM_RDFLIST = "http://i3s.unice.fr/xr2rml#RdfList"
TERM_RDFBAG = "http://i3s.unice.fr/xr2rml#RdfBag"
TERM_RDFSEQ = "http://i3s.unice.fr/xr2rml#RdfSeq"
TERM_RDFALT = "http://i3s.unice.fr/xr2rml#RdfAlt"

COLLECTION_TERM_TYPES = frozenset(
    {TERM_RDFLIST, TERM_RDFBAG, TERM_RDFSEQ, TERM_RDFALT}
)


def spark_type_to_xsd(dt: T.DataType) -> str | None:
    """Spark DataType -> XSD datatype URI (DatatypeMapper.scala:12-28 analogue).

    Strings stay untyped (plain literals), matching the reference where
    Types.CHAR -> xsd:string is commented out.
    """
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return XSD_INTEGER
    if isinstance(dt, T.DecimalType):
        return XSD_DECIMAL
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return XSD_DOUBLE
    if isinstance(dt, T.BooleanType):
        return XSD_BOOLEAN
    if isinstance(dt, T.DateType):
        return XSD_DATE
    if isinstance(dt, T.TimestampType):
        return XSD_DATETIME
    if isinstance(dt, T.BinaryType):
        return XSD_HEXBINARY
    return None


def json_type_to_xsd(value: object) -> str | None:
    """JSON value type -> XSD (MorphMongoDataTranslator.inferDataType:344-360)."""
    # bool is an int subclass in Python: test it first.
    if isinstance(value, bool):
        return XSD_BOOLEAN
    if isinstance(value, int):
        return XSD_INTEGER
    if isinstance(value, float):
        return XSD_DECIMAL
    return None


# ---------------------------------------------------------------------------
# Pure-Python term constructors (used inside pandas UDFs + unit tests)
# ---------------------------------------------------------------------------


def lex_value_to_string(value: object) -> str | None:
    """DB value -> lexical string, Java toString conventions.

    Java prints booleans lower-case and integral numbers without '.0';
    Python's str() matches except bool ('True') — normalize those.
    """
    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value.is_integer():
        # Java Double.toString(100.0) == "100.0"; keep the fraction digit.
        return f"{value:.1f}"
    return str(value)


def make_iri(value: object, encode_unsafe_chars_in_uri: bool = True) -> str | None:
    """N-Triples IRI from a value (createIRI, MorphBaseDataTranslator:236-242).

    Divergence from the reference: embedded control chars (\\n, \\r, \\t) are
    removed — the reference would pass them to Jena and emit a broken term;
    a distributed one-triple-per-line sink cannot tolerate that.
    """
    s = lex_value_to_string(value)
    if s is None:
        return None
    s = encoding.encode_uri(s)
    if encode_unsafe_chars_in_uri:
        s = encoding.encode_url(s)
    s = s.replace("\n", "").replace("\r", "").replace("\t", "")
    return f"<{s}>"


def _escape_ntriples(value: str) -> str:
    # N-Triples string escaping (serialization only, injective): raw
    # literal values may contain backslashes/quotes/controls.
    return (
        value.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def make_literal(
    value: object,
    datatype: str | None = None,
    language: str | None = None,
) -> str | None:
    """N-Triples literal (createLiteral, MorphBaseDataTranslator:249-274).

    The reference computes encodeLiteral + dateTime/boolean conversion
    but then constructs RDFTermLiteral with the RAW value (:267) and
    hands term.value straight to Jena (createLiteralNode :86-93), so
    the emitted literal keeps the raw lexical form — confirmed by the
    reference's own recorded e2e output (example_mongo_dblp/result.txt
    contains '"Yes, it can be done".' with literal quotes, not %22;
    replayed in tests/test_dblp_suite.py). We emit the raw value too;
    the only transformation is N-Triples escaping, which is
    serialization, not value mutation. encoding.encode_literal /
    normalize_datetime / normalize_boolean remain as documented ports
    of the (dead-at-this-call-site) utility functions.
    """
    s = lex_value_to_string(value)
    if s is None:
        return None
    s = _escape_ntriples(s)
    if language:
        return f'"{s}"@{language}'
    if datatype:
        return f'"{s}"^^<{datatype}>'
    return f'"{s}"'


def make_blank_node(value: object) -> str | None:
    """Blank node label; reference applies encodeUrl to the label
    (MorphBaseDataTranslator.scala:227)."""
    s = lex_value_to_string(value)
    if s is None:
        return None
    return "_:" + encoding.encode_url(s)


def make_term(
    value: object,
    term_type: str,
    datatype: str | None = None,
    language: str | None = None,
    encode_unsafe_chars_in_uri: bool = True,
) -> str | None:
    if term_type == TERM_IRI:
        return make_iri(value, encode_unsafe_chars_in_uri)
    if term_type == TERM_BLANKNODE:
        return make_blank_node(value)
    return make_literal(value, datatype, language)


# ---------------------------------------------------------------------------
# Column-level term constructors (JVM-side, codegen'd — the hot path)
# ---------------------------------------------------------------------------


def lex_value_col(col: Column, dt: T.DataType) -> Column:
    """Cast a source column to its lexical string form (Java conventions)."""
    if isinstance(dt, T.BooleanType):
        return F.when(col, F.lit("true")).when(~col, F.lit("false"))
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        # match Java Double.toString for integral doubles: 100.0 -> "100.0"
        as_str = col.cast("string")
        return F.when(
            col.cast("long").cast(dt) == col, F.concat(col.cast("long").cast("string"), F.lit(".0"))
        ).otherwise(as_str)
    if isinstance(dt, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.S")
    return col.cast("string")


def iri_col(col: Column, encode_unsafe_chars_in_uri: bool = True) -> Column:
    c = encoding.encode_uri_col(col)
    if encode_unsafe_chars_in_uri:
        c = encoding.encode_url_col(c)
    # strip embedded control chars (see make_iri divergence note)
    for ch in ("\n", "\r", "\t"):
        c = F.replace(c, F.lit(ch), F.lit(""))
    return F.concat(F.lit("<"), c, F.lit(">"))


def escape_ntriples_col(col: Column) -> Column:
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def literal_col(
    col: Column,
    datatype: str | None = None,
    language: str | None = None,
) -> Column:
    # raw value + N-Triples escaping only — see make_literal: the
    # reference's encodeLiteral/normalization results are discarded at
    # its only materialization call site, so emitted literals are raw
    c = escape_ntriples_col(col)
    if language:
        return F.concat(F.lit('"'), c, F.lit('"@' + language))
    if datatype:
        return F.concat(F.lit('"'), c, F.lit('"^^<' + datatype + ">"))
    return F.concat(F.lit('"'), c, F.lit('"'))


def blank_node_col(col: Column) -> Column:
    return F.concat(F.lit("_:"), encoding.encode_url_col(col))


def term_col(
    col: Column,
    term_type: str,
    datatype: str | None = None,
    language: str | None = None,
    encode_unsafe_chars_in_uri: bool = True,
) -> Column:
    if term_type == TERM_IRI:
        return iri_col(col, encode_unsafe_chars_in_uri)
    if term_type == TERM_BLANKNODE:
        return blank_node_col(col)
    return literal_col(col, datatype, language)
