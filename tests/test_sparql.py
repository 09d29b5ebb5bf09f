"""SPARQL-BGP-over-triple-table tests (the DataFrame replacement for
the reference's query-rewriting engine, SURVEY §2.12/§3.2)."""

from __future__ import annotations

import pytest

from morph_xr2rml_spark.sparql import parse_sparql, sparql_select

EX = "http://example.org/"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # people
        (f"<{EX}p/1>", f"<{EX}name>", '"alice"'),
        (f"<{EX}p/2>", f"<{EX}name>", '"bob"'),
        (f"<{EX}p/3>", f"<{EX}name>", '"carol"'),
        (f"<{EX}p/1>", f"<{EX}age>", '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        (f"<{EX}p/2>", f"<{EX}age>", '"17"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        # knows graph
        (f"<{EX}p/1>", f"<{EX}knows>", f"<{EX}p/2>"),
        (f"<{EX}p/2>", f"<{EX}knows>", f"<{EX}p/3>"),
        # types
        (f"<{EX}p/1>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", f"<{EX}Person>"),
        (f"<{EX}p/2>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", f"<{EX}Person>"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_parse_basics():
    q = parse_sparql(
        """PREFIX ex: <http://example.org/>
        SELECT DISTINCT ?a ?b WHERE { ?a ex:knows ?b . ?b a ex:Person }
        ORDER BY DESC(?a) LIMIT 5 OFFSET 1"""
    )
    assert q.distinct and q.variables == ["a", "b"]
    assert len(q.where.patterns) == 2
    assert q.where.patterns[1].p.endswith("22-rdf-syntax-ns#type>")
    assert q.order_by == [("a", False)] and q.limit == 5 and q.offset == 1


def test_bgp_join(triples):
    out = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?n1 ?n2 WHERE {
            ?x ex:knows ?y . ?x ex:name ?n1 . ?y ex:name ?n2 }""",
    )
    assert rows(out) == {('"alice"', '"bob"'), ('"bob"', '"carol"')}


def test_optional_and_bound(triples):
    out = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?n ?age WHERE {
            ?x ex:name ?n .
            OPTIONAL { ?x ex:age ?age } }""",
    )
    got = {r["n"]: r["age"] for r in out.collect()}
    assert got['"carol"'] is None
    assert got['"alice"'].startswith('"30"')

    unbound = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?n WHERE {
            ?x ex:name ?n .
            OPTIONAL { ?x ex:age ?age }
            FILTER (!BOUND(?age)) }""",
    )
    assert rows(unbound) == {('"carol"',)}


def test_filter_numeric_and_regex(triples):
    adults = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?n WHERE {
            ?x ex:name ?n . ?x ex:age ?age
            FILTER (?age >= 18) }""",
    )
    assert rows(adults) == {('"alice"',)}

    re_match = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?n WHERE { ?x ex:name ?n FILTER (REGEX(?n, "^\\"[ab]")) }""",
    )
    assert rows(re_match) == {('"alice"',), ('"bob"',)}


def test_union(triples):
    out = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?v WHERE {
            { ?x ex:name ?v . FILTER (?v = "alice") }
            UNION
            { ?x ex:name ?v . FILTER (?v = "bob") } }""",
    )
    assert rows(out) == {('"alice"',), ('"bob"',)}


def test_same_var_twice(triples):
    # ?x knows ?x — nobody knows themselves
    out = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?x WHERE { ?x ex:knows ?x }""",
    )
    assert out.count() == 0


def test_order_limit(triples):
    out = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?n WHERE { ?x ex:name ?n } ORDER BY ?n LIMIT 2""",
    )
    assert [r["n"] for r in out.collect()] == ['"alice"', '"bob"']
