"""Golden-vector tests for the encoding kernel (SURVEY §1.5).

Vectors derived from morph-core GeneralUtility.scala:19-172 and
MorphBaseDataTranslator.scala:302-311 — every replacement rule and their
order, both the pure-Python and the Spark Column forms.
"""

import pytest
from pyspark.sql import functions as F

from morph_xr2rml_spark.functions import encoding as E

LITERAL_VECTORS = [
    ("plain", "plain"),
    ("back\\slash", "back/slash"),
    ('say "hi"', "say %22hi%22"),
    ("a__b____c", "a_b_c"),
    ("line1\nline2\rline3", "line1line2line3"),
    ("_x_", "_x_"),
    ("", ""),
    # order: backslash first, then quote; a \" sequence becomes /%22
    ('\\"', "/%22"),
]

URL_VECTORS = [
    ("no change", "no%20change"),
    # '#', '?', '/', ':', '&' intentionally untouched
    ("http://ex.org/a?b=c&d#e", "http://ex.org/a?b%3Dc&d#e"),
    ("a b!c\"d$e'f(g)h*i+j,k;l<m=n>o@p^q[r\\s]t`u{v|w}x~y",
     "a%20b%21c%22d%24e%27f%28g%29h%2Ai%2Bj%2Ck%3Bl%3Cm%3Dn%3Eo%40p%5Eq%5Br%5Cs%5Dt%60u%7Bv%7Cw%7Dx%7Ey"),
    ("%", "%"),  # '%' NOT escaped by encodeUrl
]

RESERVED_VECTORS = [
    ("50%", "50%25"),
    ("a/b:c#d?e&f", "a%2Fb%3Ac%23d%3Fe%26f"),
    ("Scuba diving", "Scuba%20diving"),
    # '%' first: "% " -> "%25%20", not "%2520"
    ("% ", "%25%20"),
    ("100%20", "100%2520"),
]

DECODE_VECTORS = [
    ("a%20b", "a b"),
    ("%2Fx%2fy", "/x/y"),
    ("%2520", "%20"),  # %25 decoded last
]


@pytest.mark.parametrize("src,expected", LITERAL_VECTORS)
def test_encode_literal(src, expected):
    assert E.encode_literal(src) == expected


@pytest.mark.parametrize("src,expected", URL_VECTORS)
def test_encode_url(src, expected):
    assert E.encode_url(src) == expected


@pytest.mark.parametrize("src,expected", RESERVED_VECTORS)
def test_encode_reserved(src, expected):
    assert E.encode_reserved_chars(src) == expected


@pytest.mark.parametrize("src,expected", DECODE_VECTORS)
def test_decode_uri(src, expected):
    assert E.decode_uri(src) == expected


def test_encode_uri_trim():
    assert E.encode_uri("  x  ") == "x"
    assert E.encode_uri("\t\nx\x00 ") == "x"


def test_normalize_datetime():
    assert E.normalize_datetime(" 2000-12-31 00:00:00 ") == "2000-12-31T00:00:00"


def test_normalize_boolean():
    for v in ("T", "t", "True", "TRUE", "1"):
        assert E.normalize_boolean(v) == "true"
    for v in ("F", "0", "no", "false-ish"):
        assert E.normalize_boolean(v) == "false"


def test_none_passthrough():
    for fn in (E.encode_literal, E.encode_url, E.encode_reserved_chars,
               E.decode_uri, E.encode_uri, E.normalize_datetime,
               E.normalize_boolean):
        assert fn(None) is None


def test_column_forms_match_python(spark):
    """The JVM-side Column chains must agree byte-for-byte with the
    pure-Python forms on every vector."""
    vectors = sorted(
        {s for s, _ in LITERAL_VECTORS + URL_VECTORS + RESERVED_VECTORS + DECODE_VECTORS}
        | {"  pad  ", "2000-12-31 00:00:00", "True", "0"}
    )
    df = spark.createDataFrame([(v,) for v in vectors], ["v"])
    out = df.select(
        F.col("v"),
        E.encode_literal_col(F.col("v")).alias("lit"),
        E.encode_url_col(F.col("v")).alias("url"),
        E.encode_reserved_chars_col(F.col("v")).alias("res"),
        E.decode_uri_col(F.col("v")).alias("dec"),
        E.encode_uri_col(F.col("v")).alias("uri"),
        E.normalize_datetime_col(F.col("v")).alias("dt"),
        E.normalize_boolean_col(F.col("v")).alias("bool"),
    ).collect()
    for row in out:
        assert row["lit"] == E.encode_literal(row["v"]), row["v"]
        assert row["url"] == E.encode_url(row["v"]), row["v"]
        assert row["res"] == E.encode_reserved_chars(row["v"]), row["v"]
        assert row["dec"] == E.decode_uri(row["v"]), row["v"]
        assert row["uri"] == E.encode_uri(row["v"]), row["v"]
        assert row["dt"] == E.normalize_datetime(row["v"]), row["v"]
        assert row["bool"] == E.normalize_boolean(row["v"]), row["v"]
