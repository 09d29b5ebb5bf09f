"""xR2RML value-encoding kernel.

Reimplements, with identical observable behavior, the encoder chain of the
reference (morph-core GeneralUtility.scala:19-172 and
morph-base MorphBaseDataTranslator.scala:302-311):

  * ``encode_literal``        — GeneralUtility.encodeLiteral  (:19-39)
  * ``encode_uri``            — GeneralUtility.encodeURI      (:41-56), null map => trim
  * ``encode_url``            — GeneralUtility.encodeUrl      (:74-103), template-string
                                unsafe chars; '#', '?', '/', ':', '&' intentionally kept
  * ``encode_reserved_chars`` — GeneralUtility.encodeReservedChars (:108-143),
                                DB values injected into IRIs; '%' escaped FIRST
  * ``decode_uri``            — GeneralUtility.decodeURI      (:145-172)
  * ``normalize_datetime``    — MorphBaseDataTranslator.translateDateTime (:302-304)
  * ``normalize_boolean``     — MorphBaseDataTranslator.translateBoolean  (:306-311)

Each function exists in two forms:
  1. a pure-Python form (driver-side constant folding + pandas-UDF internals);
  2. a Spark ``Column`` form built from chained JVM-side ``F.replace`` /
     ``F.regexp_replace`` so the hot path stays inside whole-stage codegen —
     no Python round-trip for encoding.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# encodeLiteral
# ---------------------------------------------------------------------------
# The reference applies, in order (GeneralUtility.scala:19-39):
#   1. backslash -> "/"          (regex \\ )
#   2. '"'       -> "%22"
#   3. literal two-char "\n"/"\r"/"\ " replacements — dead code: step 1 already
#      removed every backslash, so these can never match; we skip them.
#   4. "_{2,}+"  -> "_"          (squeeze runs of underscores)
#   5. strip real "\n" and "\r"
#   6. replace("\ ", "/")        — dead for the same reason as 3.

_SQUEEZE_UNDERSCORES = re.compile(r"_{2,}")


def encode_literal(value: str | None) -> str | None:
    if value is None:
        return None
    v = value.replace("\\", "/")
    v = v.replace('"', "%22")
    v = _SQUEEZE_UNDERSCORES.sub("_", v)
    v = v.replace("\n", "").replace("\r", "")
    return v


def encode_literal_col(col: Column) -> Column:
    c = F.replace(col, F.lit("\\"), F.lit("/"))
    c = F.replace(c, F.lit('"'), F.lit("%22"))
    c = F.regexp_replace(c, "_{2,}", "_")
    c = F.replace(c, F.lit("\n"), F.lit(""))
    c = F.replace(c, F.lit("\r"), F.lit(""))
    return c


# ---------------------------------------------------------------------------
# encodeURI — called with a null char map everywhere in materialization
# (MorphBaseDataTranslator.scala:238), so it reduces to trim().
# Java's String.trim strips all chars <= U+0020 from both ends.
# ---------------------------------------------------------------------------

_JAVA_TRIM_CHARS = "".join(chr(i) for i in range(0x21))


def encode_uri(value: str | None) -> str | None:
    if value is None:
        return None
    return value.strip(_JAVA_TRIM_CHARS)


def encode_uri_col(col: Column) -> Column:
    # btrim with an explicit trim-character set mirroring Java String.trim
    return F.btrim(col, F.lit(_JAVA_TRIM_CHARS))


# ---------------------------------------------------------------------------
# encodeUrl — template-string unsafe chars. '#', '?', '/', ':', '&' untouched
# (intentional: if they appear in a template they are meant as IRI structure).
# Order of replacements follows the reference exactly; none of the targets
# produce '%' sequences that a later rule would re-match except that '%' is
# NOT escaped here (unlike encodeReservedChars) — faithful to the reference.
# ---------------------------------------------------------------------------

_ENCODE_URL_PAIRS: list[tuple[str, str]] = [
    (" ", "%20"), ("!", "%21"), ('"', "%22"), ("$", "%24"), ("'", "%27"),
    ("(", "%28"), (")", "%29"), ("*", "%2A"), ("+", "%2B"), (",", "%2C"),
    (";", "%3B"), ("<", "%3C"), ("=", "%3D"), (">", "%3E"), ("@", "%40"),
    ("^", "%5E"), ("[", "%5B"), ("\\", "%5C"), ("]", "%5D"), ("`", "%60"),
    ("{", "%7B"), ("|", "%7C"), ("}", "%7D"), ("~", "%7E"),
]


def encode_url(value: str | None) -> str | None:
    if value is None:
        return None
    for src, dst in _ENCODE_URL_PAIRS:
        value = value.replace(src, dst)
    return value


def encode_url_col(col: Column) -> Column:
    c = col
    for src, dst in _ENCODE_URL_PAIRS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


# ---------------------------------------------------------------------------
# encodeReservedChars — DB values injected into IRIs; '%' -> '%25' FIRST
# (GeneralUtility.scala:113 "keep in first place!"), then the full reserved
# set including '#', '&', '/', ':', '?' which encodeUrl leaves alone.
# ---------------------------------------------------------------------------

_ENCODE_RESERVED_PAIRS: list[tuple[str, str]] = [
    ("%", "%25"),
    (" ", "%20"), ("!", "%21"), ('"', "%22"), ("#", "%23"), ("$", "%24"),
    ("&", "%26"), ("'", "%27"), ("(", "%28"), (")", "%29"), ("*", "%2A"),
    ("+", "%2B"), (",", "%2C"), ("/", "%2F"), (":", "%3A"), (";", "%3B"),
    ("<", "%3C"), ("=", "%3D"), (">", "%3E"), ("?", "%3F"), ("@", "%40"),
    ("^", "%5E"), ("[", "%5B"), ("\\", "%5C"), ("]", "%5D"), ("`", "%60"),
    ("{", "%7B"), ("|", "%7C"), ("}", "%7D"), ("~", "%7E"),
]


def encode_reserved_chars(value: str | None) -> str | None:
    if value is None:
        return None
    for src, dst in _ENCODE_RESERVED_PAIRS:
        value = value.replace(src, dst)
    return value


def encode_reserved_chars_col(col: Column) -> Column:
    c = col
    for src, dst in _ENCODE_RESERVED_PAIRS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


# ---------------------------------------------------------------------------
# decodeURI — inverse mapping (query-rewriting side); the reference decodes
# both upper- and lower-case hex for a subset and decodes %25 LAST.
# ---------------------------------------------------------------------------

_DECODE_URI_PAIRS: list[tuple[str, str]] = [
    ("%20", " "), ("%21", "!"), ("%22", '"'), ("%23", "#"), ("%24", "$"),
    ("%26", "&"), ("%27", "'"), ("%28", "("), ("%29", ")"),
    ("%2A", "*"), ("%2a", "*"), ("%2B", "+"), ("%2b", "+"),
    ("%2C", ","), ("%2c", ","), ("%2D", "-"), ("%2d", "-"),
    ("%2E", "."), ("%2e", "."), ("%2F", "/"), ("%2f", "/"),
    ("%25", "%"),
]


def decode_uri(value: str | None) -> str | None:
    if value is None:
        return None
    for src, dst in _DECODE_URI_PAIRS:
        value = value.replace(src, dst)
    return value


def decode_uri_col(col: Column) -> Column:
    c = col
    for src, dst in _DECODE_URI_PAIRS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


# ---------------------------------------------------------------------------
# Lexical normalization of typed literals
# ---------------------------------------------------------------------------


def normalize_datetime(value: str | None) -> str | None:
    """xsd:dateTime lexical fix-up: ' ' -> 'T' after trim."""
    if value is None:
        return None
    return value.strip().replace(" ", "T")


def normalize_datetime_col(col: Column) -> Column:
    return F.replace(F.trim(col), F.lit(" "), F.lit("T"))


def normalize_boolean(value: str | None) -> str | None:
    """xsd:boolean: T/True/1 (case-insensitive) -> 'true', else 'false'."""
    if value is None:
        return None
    return "true" if value.lower() in ("t", "true", "1") else "false"


def normalize_boolean_col(col: Column) -> Column:
    return F.when(F.lower(col).isin("t", "true", "1"), F.lit("true")).otherwise(
        F.lit("false")
    )
