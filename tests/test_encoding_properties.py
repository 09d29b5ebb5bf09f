"""Property-based checks of the encoding kernel (hypothesis).

The §1.5 encoder chain is the byte-exactness foundation: the compiler's
codegen Column chains must agree with the pure-Python forms on ANY
input (not just golden vectors), reserved-char encoding must be
reversible (the injectivity the dedup-routing elision relies on —
compiler/compile.py `_TermExpr.injective`), and the lexical
normalizers must be idempotent.
"""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from morph_xr2rml_spark.functions import encoding as E

# printable-ish unicode incl. every char the chains rewrite
_NASTY = "%!\"#$&'()*+,/:;<=>?@^[]\\`{|}~ \t\n\r_" + "é世 "
_text = st.text(
    alphabet=st.one_of(
        st.sampled_from(_NASTY),
        st.characters(min_codepoint=32, max_codepoint=0x2FA0),
    ),
    max_size=40,
)


def _decode_reserved(s: str) -> str:
    # decoding in reverse encoding order inverts the chain ('%' -> '%25'
    # is applied FIRST when encoding, so it is undone LAST)
    for src, dst in reversed(E._ENCODE_RESERVED_PAIRS):
        s = s.replace(dst, src)
    return s


@given(st.lists(_text, min_size=1, max_size=80))
@settings(max_examples=5, deadline=None)
def test_column_forms_match_python_on_random_text(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = df.select(
        "v",
        E.encode_literal_col(F.col("v")).alias("lit"),
        E.encode_url_col(F.col("v")).alias("url"),
        E.encode_reserved_chars_col(F.col("v")).alias("res"),
        E.decode_uri_col(F.col("v")).alias("dec"),
        E.encode_uri_col(F.col("v")).alias("uri"),
    ).collect()
    for row in out:
        assert row["lit"] == E.encode_literal(row["v"])
        assert row["url"] == E.encode_url(row["v"])
        assert row["res"] == E.encode_reserved_chars(row["v"])
        assert row["dec"] == E.decode_uri(row["v"])
        assert row["uri"] == E.encode_uri(row["v"])


@given(_text)
def test_reserved_encoding_round_trips(v):
    assert _decode_reserved(E.encode_reserved_chars(v)) == v


@given(_text, _text)
def test_reserved_encoding_injective_under_concat(a, b):
    """Reserved-char encoding itself is injective, so single-group
    template expansion determines the encoded value..."""
    ta = "p/" + E.encode_reserved_chars(a) + "/s"
    tb = "p/" + E.encode_reserved_chars(b) + "/s"
    assert (ta == tb) == (a == b)


@given(_text)
def test_reserved_encoding_boundary(v):
    """...BUT the chain is reference-faithful and leaves C0 controls
    (\\t \\n \\r etc.) unencoded — the downstream IRI strip/trim then
    deletes them, which is exactly why the compiler's dedup-routing
    only claims construction injectivity for control-free lexical
    source types (compiler/compile.py _control_free_lexical; the
    string-typed collision is pinned in
    tests/test_dedup_routing.py::test_control_chars_in_string_template).
    Everything the encoding DOES rewrite is gone from the output."""
    enc = E.encode_reserved_chars(v)
    assert not re.search(r"[ <>\"{}|\\^`/?#&:;=@,!'()*+$\[\]~]", enc)


@given(_text)
def test_normalizers_idempotent(v):
    for fn in (E.normalize_datetime, E.normalize_boolean, E.encode_uri):
        assert fn(fn(v)) == fn(v)


# ---------------------------------------------------------------------------
# multi-group digit-template injectivity (compiler/compile.py
# _separators_unambiguous): the concatenation of digit renderings and
# safe separators must parse back uniquely — property-checked by
# round-tripping random integer tuples through a random safe template.
# ---------------------------------------------------------------------------

from morph_xr2rml_spark.compiler.compile import (  # noqa: E402
    _SAFE_SEP_FIRST,
    _separators_unambiguous,
)

_sep = st.text(
    alphabet=st.sampled_from(sorted(_SAFE_SEP_FIRST)), min_size=1, max_size=3
)
_ints = st.lists(st.integers(-10**9, 10**9), min_size=2, max_size=4)


@settings(max_examples=200, deadline=None)
@given(_ints, st.data())
def test_digit_template_render_is_injective(vals, data):
    seps = [data.draw(_sep) for _ in range(len(vals) - 1)]
    parts: list = ["http://x/"]
    for i, _ in enumerate(vals):
        parts.append(i)
        if i < len(seps):
            parts.append(seps[i])
    assert _separators_unambiguous(parts)
    rendered = "".join(
        str(vals[p]) if isinstance(p, int) else p for p in parts
    )
    # parse back: strip prefix, then alternate maximal [0-9-] runs and
    # the known separators
    rest = rendered[len("http://x/"):]
    out = []
    for i in range(len(vals)):
        m = re.match(r"[0-9-]*", rest)
        out.append(int(m.group(0)))
        rest = rest[m.end():]
        if i < len(seps):
            assert rest.startswith(seps[i])
            rest = rest[len(seps[i]):]
    assert out == vals and rest == ""


@settings(max_examples=50, deadline=None)
@given(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6))
def test_adjacent_groups_flagged_ambiguous(a, b):
    # no separator between groups -> must be rejected
    assert not _separators_unambiguous(["p/", 0, 1])
    # digit-opening separator -> rejected ('1' could open a group run)
    assert not _separators_unambiguous(["p/", 0, "5x", 1])


# ---------------------------------------------------------------------------
# chain-elision fixed-point premise: digit renderings are invariant
# under EVERY chain the elided pipeline skips
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.integers(-10**12, 10**12))
def test_digit_renderings_chain_invariant(n):
    s = str(n)
    assert E.encode_url(s) == s
    assert E.encode_reserved_chars(s) == s
    assert E.encode_uri(s) == s
