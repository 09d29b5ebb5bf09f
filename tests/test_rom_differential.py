"""Randomized differential for RefObjectMap joins (J1/J4): the compiled
triples must equal a pure-Python evaluation of the xR2RML semantics —
string-compared value intersection over all (child, parent) row pairs
(childValues.map(_.toString), MorphRDBDataTranslator.scala:170-180),
rows with a nothing-valued reference joining nothing, null subject
components dropping the triple. Covers cross-table joins, same-source
joins with and without a uniqueness declaration, typed-key mismatches
(int child vs string parent), and multi-condition joins."""

import pytest
from hypothesis import given, settings, strategies as st

from morph_xr2rml_spark.compiler import MappingCompiler
from morph_xr2rml_spark.mapping import parse_mapping
from morph_xr2rml_spark.sources.catalog import SourceCatalog

EX = "http://example.org"

CROSS_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/> .

<#TMParent>
    xrr:logicalSource [ rr:tableName "par"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/p/{pid}" ];
    .

<#TMChild>
    xrr:logicalSource [ rr:tableName "chi"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/c/{cid}" ];
    rr:predicateObjectMap [
        rr:predicate ex:rel;
        rr:objectMap [
            rr:parentTriplesMap <#TMParent>;
            rr:joinCondition [ rr:child "k"; rr:parent "k" ];
            JC2
        ];
    ];
    .
"""

SELF_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/> .

<#TMParent>
    xrr:logicalSource [ rr:tableName "chi"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/p/{pid}" ];
    .

<#TMChild>
    xrr:logicalSource [ rr:tableName "chi"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/c/{cid}" ];
    rr:predicateObjectMap [
        rr:predicate ex:rel;
        rr:objectMap [
            rr:parentTriplesMap <#TMParent>;
            rr:joinCondition [ rr:child "k"; rr:parent "k" ];
        ];
    ];
    .
"""


def _expected(children, parents, conds=1):
    """Pure-Python xR2RML ROM semantics over (cid, pid, k, k2) rows."""
    out = set()
    for c in children:
        cid, _pid, ck, ck2 = c
        if cid is None:
            continue
        keys = [ck] + ([ck2] if conds == 2 else [])
        if any(k is None for k in keys):
            continue
        for p in parents:
            _cid2, pid, pk, pk2 = p
            if pid is None:
                continue
            pkeys = [pk] + ([pk2] if conds == 2 else [])
            if any(k is None for k in pkeys):
                continue
            if all(str(a) == str(b) for a, b in zip(keys, pkeys)):
                out.add((f"<{EX}/c/{cid}>", f"<{EX}/p/{pid}>"))
    return out


def _got(spark, ttl, tables, unique_key=None):
    doc = parse_mapping(ttl)
    catalog = SourceCatalog(spark)
    for name, df in tables.items():
        catalog.register(
            name, df, unique_key=unique_key if name == "chi" else None
        )
    comp = MappingCompiler(spark, doc, catalog)
    try:
        return {
            (s, o)
            for s, p, o in (tuple(r) for r in comp.triples().collect())
            if "rel" in p
        }
    finally:
        comp.release()


_ROW = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # cid
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # pid
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # k
    st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # k2
)


@settings(max_examples=10, deadline=None)
@given(
    children=st.lists(_ROW, min_size=0, max_size=6),
    parents=st.lists(_ROW, min_size=0, max_size=6),
    two_conds=st.booleans(),
    typed_mismatch=st.booleans(),
)
def _cross_table_rom_differential(
    spark, children, parents, two_conds, typed_mismatch
):
    ttl = CROSS_TTL.replace(
        "JC2",
        'rr:joinCondition [ rr:child "k2"; rr:parent "k2" ];'
        if two_conds
        else "",
    )
    chi = spark.createDataFrame(
        children or [(None,) * 4], "cid int, pid int, k int, k2 int"
    )
    if not children:
        chi = chi.where("cid IS NOT NULL")
    # typed mismatch: the parent key columns are STRINGS of the same
    # digits — string-compared intersection must still join
    pschema = (
        "cid int, pid int, k string, k2 string"
        if typed_mismatch
        else "cid int, pid int, k int, k2 int"
    )
    prows = [
        (c, p, str(k) if typed_mismatch and k is not None else k,
         str(k2) if typed_mismatch and k2 is not None else k2)
        for c, p, k, k2 in parents
    ] or [(None,) * 4]
    par = spark.createDataFrame(prows, pschema)
    if not parents:
        par = par.where("cid IS NOT NULL")
    got = _got(spark, ttl, {"chi": chi, "par": par})
    want = _expected(children, parents, conds=2 if two_conds else 1)
    assert got == want, f"children={children} parents={parents} " \
        f"two_conds={two_conds} typed={typed_mismatch}"


def test_differential_cross_table_rom(spark):
    _cross_table_rom_differential(spark)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(_ROW, min_size=0, max_size=6),
    declare_unique=st.booleans(),
)
def _same_source_rom_differential(spark, rows, declare_unique):
    """Same-source ROM: with a unique-key declaration the data is made
    unique on k first (a declaration the data violates is user error),
    without one arbitrary key multiplicity must cross-join."""
    if declare_unique:
        seen: set[int] = set()
        uniq = []
        for r in rows:
            if r[2] is not None and r[2] in seen:
                continue
            if r[2] is not None:
                seen.add(r[2])
            uniq.append(r)
        rows = uniq
    chi = spark.createDataFrame(
        rows or [(None,) * 4], "cid int, pid int, k int, k2 int"
    )
    if not rows:
        chi = chi.where("cid IS NOT NULL")
    got = _got(
        spark, SELF_TTL, {"chi": chi},
        unique_key=["k"] if declare_unique else None,
    )
    want = _expected(rows, rows, conds=1)
    assert got == want, f"rows={rows} unique={declare_unique}"


def test_differential_same_source_rom(spark):
    _same_source_rom_differential(spark)
