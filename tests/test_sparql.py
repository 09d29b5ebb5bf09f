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


def test_result_serialization(spark, triples):
    import json as _json

    from morph_xr2rml_spark.sparql import ask, to_sparql_json, to_sparql_xml

    df = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?x ?n ?age WHERE {
            ?x ex:name ?n OPTIONAL { ?x ex:age ?age } } ORDER BY ?n""",
    )
    doc = _json.loads(to_sparql_json(df))
    assert doc["head"]["vars"] == ["x", "n", "age"]
    b0 = doc["results"]["bindings"][0]
    assert b0["x"]["type"] == "uri" and b0["x"]["value"] == "http://example.org/p/1"
    assert b0["n"] == {"type": "literal", "value": "alice"}
    assert b0["age"]["datatype"].endswith("integer")
    # carol has no age -> var absent from her binding
    assert "age" not in doc["results"]["bindings"][2]

    xml = to_sparql_xml(df)
    assert '<variable name="n"/>' in xml
    assert "<uri>http://example.org/p/1</uri>" in xml
    assert 'datatype="http://www.w3.org/2001/XMLSchema#integer">30</literal>' in xml

    assert ask(df) is True
    assert ask(df.where("n = '\"nobody\"'")) is False


def test_result_csv_tsv(spark, triples, tmp_path):
    from morph_xr2rml_spark.sparql import write_csv, write_tsv

    df = sparql_select(
        triples,
        """PREFIX ex: <http://example.org/>
        SELECT ?x ?n WHERE { ?x ex:name ?n }""",
    )
    csv_dir = str(tmp_path / "csv")
    write_csv(df, csv_dir)
    back = spark.read.option("header", True).csv(csv_dir)
    vals = {(r["x"], r["n"]) for r in back.collect()}
    assert ("http://example.org/p/1", "alice") in vals

    tsv_dir = str(tmp_path / "tsv")
    write_tsv(df, tsv_dir)
    back2 = spark.read.option("header", True).option("sep", "\t").csv(tsv_dir)
    vals2 = {(r["x"], r["n"]) for r in back2.collect()}
    assert ("<http://example.org/p/1>", '"alice"') in vals2
