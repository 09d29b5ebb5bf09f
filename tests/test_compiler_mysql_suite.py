"""End-to-end replay of the reference's example_mysql mapping suite
(/root/reference/morph-xr2rml-dist/example_mysql/: mapping.ttl +
testdb_dump.sql) over equivalent in-memory tables.

Golden triples are hand-derived from the reference's documented semantics
(SURVEY §1-§2; README.md:100-124 describes the expected output shape):
template expansion with mixed syntax paths, multi-valued JSONPath/CSV
references, RdfList + nested term map, plain-column and JSONPath-valued
RefObjectMap joins.
"""

import pathlib

import pytest
from pyspark.sql import functions as F

from morph_xr2rml_spark.compiler import CompileOptions, MappingCompiler
from morph_xr2rml_spark.mapping import parse_mapping
from morph_xr2rml_spark.sources import SourceCatalog

MAPPING = pathlib.Path(
    "/root/reference/morph-xr2rml-dist/example_mysql/mapping.ttl"
).read_text()

EX = "http://example.com/"
S = "http://example.org/student/"
SP = "http://example.org/sport/"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
RDF_FIRST = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
RDF_REST = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
RDF_NIL = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

B1_NAME = (
    '<?xml version="1.0"?>\n<FullName>\n<FirstNames><FirstName>Paul</FirstName>'
    "<FirstName>Jack</FirstName></FirstNames>\n<LastName>Smith</LastName>\n</FullName>"
)
B2_NAME = (
    "<FullName>\n<FirstNames><FirstName>John</FirstName>"
    "<FirstName>Fitzgerald</FirstName></FirstNames>\n<LastName>Kennedy</LastName>\n</FullName>\n"
)
B3_NAME = (
    "<FullName>\n<FirstNames><FirstName>Mike</FirstName></FirstNames>\n"
    "<LastName>Peterson</LastName>\n</FullName>\n"
)


@pytest.fixture(scope="module")
def triples_df(spark):
    student = spark.createDataFrame(
        [
            ("B1", '[{"hobby": "Swimming","place": "sea"},{"hobby": "Soccer","place": "street"}]',
             B1_NAME, 0, None, None),
            ("B2", '[{"hobby": "Hiking","place": "Mountain"},{"hobby": "Basketball","place": "street"},{"sportInClub": [100, 200, 300]}]',
             B2_NAME, 100, None, "john@acd.edu"),
            ("B3", "", B3_NAME, None, "www.george.edu", None),
            ("B4", '[{"sportInClub": [400, 500, 600]}]', None, 600, "www.starr.edu", "ringo@acd.edu"),
        ],
        "id string, comments string, name string, sport int, webpage string, email string",
    )
    sport = spark.createDataFrame(
        [
            (0, "BasketBall", "B, BSK, BK", '{"color1": "black","color2": "grey"}'),
            (100, "Tennis", "T, TN,TNS", ' ["blue", "red", "brown"]'),
            (200, "Chess", "CHS", ' {"color": "yellow"}'),
            (300, "Scuba diving", "SCB,DIV", None),
            (400, "Free diving", "FD,APNEA", None),
            (500, "Pool", "P,PL,POO", '{"color": "grey", "color": "orange"}'),
            (600, "Soccer", "SOC,SC", '{"color": "dark blue"}'),
        ],
        "id int, name string, code string, shirt_colors string",
    )
    catalog = SourceCatalog(spark).register("student", student).register("sport", sport)
    doc = parse_mapping(MAPPING)
    compiler = MappingCompiler(spark, doc, catalog, CompileOptions())
    df = compiler.triples()
    df.cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def triples(triples_df):
    return {(r.subj, r.pred, r.obj) for r in triples_df.collect()}


def _iri(v):
    return f"<{v}>"


def test_subjects_and_types(triples):
    expected_students = {f"{S}B1-Smith", f"{S}B2-Kennedy", f"{S}B3-Peterson", f"{S}B4-"}
    expected_sports = {
        f"{SP}0-BasketBall", f"{SP}100-Tennis", f"{SP}200-Chess",
        f"{SP}300-Scuba%20diving", f"{SP}400-Free%20diving", f"{SP}500-Pool",
        f"{SP}600-Soccer",
    }
    got_students = {s for (s, p, o) in triples if p == RDF_TYPE and o == _iri(EX + "Student")}
    got_sports = {s for (s, p, o) in triples if p == RDF_TYPE and o == _iri(EX + "Sport")}
    assert got_students == {_iri(s) for s in expected_students}
    assert got_sports == {_iri(s) for s in expected_sports}


def test_multivalued_reference_hobbies(triples):
    got = {(s, o) for (s, p, o) in triples if p == _iri(EX + "hobbies")}
    assert got == {
        (_iri(f"{S}B1-Smith"), '"Swimming"'),
        (_iri(f"{S}B1-Smith"), '"Soccer"'),
        (_iri(f"{S}B2-Kennedy"), '"Hiking"'),
        (_iri(f"{S}B2-Kennedy"), '"Basketball"'),
    }


def test_csv_path_code1(triples):
    got = {(s, o) for (s, p, o) in triples if p == _iri(EX + "code1")}
    assert got == {
        (_iri(f"{SP}0-BasketBall"), '"BSK"'),
        (_iri(f"{SP}100-Tennis"), '"TN"'),
        (_iri(f"{SP}300-Scuba%20diving"), '"DIV"'),
        (_iri(f"{SP}400-Free%20diving"), '"APNEA"'),
        (_iri(f"{SP}500-Pool"), '"PL"'),
        (_iri(f"{SP}600-Soccer"), '"SC"'),
    }


def test_simple_column_join_main_sport(triples):
    got = {(s, o) for (s, p, o) in triples if p == _iri(EX + "mainSport")}
    assert got == {
        (_iri(f"{S}B1-Smith"), _iri(f"{SP}0-BasketBall")),
        (_iri(f"{S}B2-Kennedy"), _iri(f"{SP}100-Tennis")),
        (_iri(f"{S}B4-"), _iri(f"{SP}600-Soccer")),
    }


def test_jsonpath_child_join_practice_in_club(triples):
    got = {(s, o) for (s, p, o) in triples if p == _iri(EX + "practiceInClub")}
    assert got == {
        (_iri(f"{S}B2-Kennedy"), _iri(f"{SP}100-Tennis")),
        (_iri(f"{S}B2-Kennedy"), _iri(f"{SP}200-Chess")),
        (_iri(f"{S}B2-Kennedy"), _iri(f"{SP}300-Scuba%20diving")),
        (_iri(f"{S}B4-"), _iri(f"{SP}400-Free%20diving")),
        (_iri(f"{S}B4-"), _iri(f"{SP}500-Pool")),
        (_iri(f"{S}B4-"), _iri(f"{SP}600-Soccer")),
    }


def test_jsonpath_parent_join_practiced_by(triples):
    got = {(s, o) for (s, p, o) in triples if p == _iri(EX + "practicedBy")}
    assert got == {
        (_iri(f"{SP}100-Tennis"), _iri(f"{S}B2-Kennedy")),
        (_iri(f"{SP}200-Chess"), _iri(f"{S}B2-Kennedy")),
        (_iri(f"{SP}300-Scuba%20diving"), _iri(f"{S}B2-Kennedy")),
        (_iri(f"{SP}400-Free%20diving"), _iri(f"{S}B4-")),
        (_iri(f"{SP}500-Pool"), _iri(f"{S}B4-")),
        (_iri(f"{SP}600-Soccer"), _iri(f"{S}B4-")),
    }


def _list_members(triples, subj, pred):
    """Walk rdf:first/rdf:rest chains from the head node under (subj, pred)."""
    heads = [o for (s, p, o) in triples if s == subj and p == pred]
    firsts = {s: o for (s, p, o) in triples if p == RDF_FIRST}
    rests = {s: o for (s, p, o) in triples if p == RDF_REST}
    out = []
    for head in heads:
        chain = []
        node = head
        while node != RDF_NIL:
            chain.append(firsts[node])
            node = rests[node]
        out.append(chain)
    return out


def test_rdflist_names_with_nested_datatype(triples):
    # B1: cartesian product of FirstNames x LastName, typed via nested map
    lists = _list_members(triples, _iri(f"{S}B1-Smith"), _iri(EX + "names"))
    assert lists == [[f'"Paul Smith"^^<{XSD_STRING}>', f'"Jack Smith"^^<{XSD_STRING}>']]
    lists2 = _list_members(triples, _iri(f"{S}B2-Kennedy"), _iri(EX + "names"))
    assert lists2 == [
        [f'"John Kennedy"^^<{XSD_STRING}>', f'"Fitzgerald Kennedy"^^<{XSD_STRING}>']
    ]
    lists3 = _list_members(triples, _iri(f"{S}B3-Peterson"), _iri(EX + "names"))
    assert lists3 == [[f'"Mike Peterson"^^<{XSD_STRING}>']]
    # B4: name NULL -> all template groups empty -> no term at all
    assert _list_members(triples, _iri(f"{S}B4-"), _iri(EX + "names")) == []


def test_rdflist_colors(triples):
    assert _list_members(triples, _iri(f"{SP}0-BasketBall"), _iri(EX + "colors")) == [
        ['"black"', '"grey"']
    ]
    assert _list_members(triples, _iri(f"{SP}100-Tennis"), _iri(EX + "colors")) == [
        ['"blue"', '"red"', '"brown"']
    ]
    assert _list_members(triples, _iri(f"{SP}200-Chess"), _iri(EX + "colors")) == [
        ['"yellow"']
    ]
    # duplicate JSON keys: last wins
    assert _list_members(triples, _iri(f"{SP}500-Pool"), _iri(EX + "colors")) == [
        ['"orange"']
    ]
    assert _list_members(triples, _iri(f"{SP}600-Soccer"), _iri(EX + "colors")) == [
        ['"dark blue"']
    ]
    # NULL shirt_colors -> no collection triple at all
    assert _list_members(triples, _iri(f"{SP}300-Scuba%20diving"), _iri(EX + "colors")) == []


def test_no_duplicate_triples(triples_df):
    assert triples_df.count() == triples_df.dropDuplicates().count()


def test_plan_stays_native_for_simple_template(spark, triples_df):
    """The sport subject template (pure columns) must not introduce a
    Python UDF — BatchEvalPython/ArrowEvalPython only where mixed paths
    genuinely require it."""
    plan = triples_df._jdf.queryExecution().optimizedPlan().toString()
    # sanity: plan exists and contains our union
    assert "Union" in plan or "union" in plan.lower()
