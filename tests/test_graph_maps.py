"""Named graph map tests (rr:graph / rr:graphMap -> quads())."""

from __future__ import annotations

import pytest

from morph_xr2rml_spark.compiler import MappingCompiler
from morph_xr2rml_spark.mapping import parse_mapping
from morph_xr2rml_spark.sources import SourceCatalog

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/> .

<#TM>
    xrr:logicalSource [ rr:tableName "t"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [
        rr:template "http://example.org/s/{id}";
        rr:class ex:Thing;
        rr:graph ex:gSubject;
    ];
    rr:predicateObjectMap [
        rr:predicate ex:name;
        rr:objectMap [ rr:column "name" ];
        rr:graphMap [ rr:template "http://example.org/g/{part}" ];
    ];
    rr:predicateObjectMap [
        rr:predicate ex:plain;
        rr:objectMap [ rr:column "name" ];
    ];
    .
"""

TTL_DEFAULT = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/> .

<#TM>
    xrr:logicalSource [ rr:tableName "t"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/s/{id}" ];
    rr:predicateObjectMap [
        rr:predicate ex:name;
        rr:objectMap [ rr:column "name" ];
    ];
    .
"""


@pytest.fixture(scope="module")
def source(spark):
    return spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "id long, name string, part string"
    )


def quads(spark, source, ttl):
    catalog = SourceCatalog(spark).register("t", source)
    return {
        (r["subj"], r["pred"], r["obj"], r["graph"])
        for r in MappingCompiler(spark, parse_mapping(ttl), catalog)
        .quads()
        .collect()
    }


def test_graph_maps(spark, source):
    got = quads(spark, source, TTL)
    s1 = "<http://example.org/s/1>"
    # class triple -> subject graph only
    assert (s1, RDF_TYPE, "<http://example.org/Thing>",
            "<http://example.org/gSubject>") in got
    assert not any(q[1] == RDF_TYPE and q[3] != "<http://example.org/gSubject>"
                   for q in got)
    # POM with template graphMap -> subject graph UNION pom graph
    name_graphs = {q[3] for q in got
                   if q[0] == s1 and q[1] == "<http://example.org/name>"}
    assert name_graphs == {
        "<http://example.org/gSubject>", "<http://example.org/g/x>"
    }
    # POM without its own graph map -> subject graphs
    plain_graphs = {q[3] for q in got if q[1] == "<http://example.org/plain>"}
    assert plain_graphs == {"<http://example.org/gSubject>"}


def test_default_graph_is_null(spark, source):
    got = quads(spark, source, TTL_DEFAULT)
    assert got and all(q[3] is None for q in got)


def test_triples_projects_graphs(spark, source):
    catalog = SourceCatalog(spark).register("t", source)
    tr = MappingCompiler(spark, parse_mapping(TTL), catalog).triples()
    assert "graph" not in tr.columns
    # the same (s,p,o) asserted in two graphs appears once
    rows = [tuple(r) for r in tr.collect()]
    assert len(rows) == len(set(rows))


def test_rdf_containers_bag_seq_alt(spark):
    """xrr:RdfBag / RdfSeq / RdfAlt containers (reference
    MorphBaseDataTranslator.createCollection:284-300): container node
    typed rdf:Bag/Seq/Alt with rdf:_1..rdf:_n membership triples."""
    from morph_xr2rml_spark.compiler import CompileOptions, MappingCompiler
    from morph_xr2rml_spark.mapping import parse_mapping
    from morph_xr2rml_spark.sources import SourceCatalog

    rows = [(1, '["a","b"]'), (2, '["c"]'), (3, "[]")]
    df = spark.createDataFrame(rows, "id long, vals string")
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    for ctype, cls in (("RdfBag", "Bag"), ("RdfSeq", "Seq"), ("RdfAlt", "Alt")):
        ttl = f"""\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/> .

<#TM>
    xrr:logicalSource [ rr:tableName "t"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/x/{{id}}" ];
    rr:predicateObjectMap [
        rr:predicate ex:vals;
        rr:objectMap [ xrr:reference "Column(vals)/JSONPath($.*)"; rr:termType xrr:{ctype} ];
    ];
    .
"""
        catalog = SourceCatalog(spark).register("t", df)
        doc = parse_mapping(ttl)
        out = MappingCompiler(spark, doc, catalog, CompileOptions()).triples()
        got = {tuple(r) for r in out.collect()}
        subj1 = "<http://example.org/x/1>"
        # container head triple -> a blank node, typed with the class
        heads = {o for s, p, o in got if s == subj1 and p == "<http://example.org/vals>"}
        assert len(heads) == 1
        b = heads.pop()
        assert b.startswith("_:")
        assert (b, RDF_TYPE, f"<{RDF}{cls}>") in got
        assert (b, f"<{RDF}_1>", '"a"') in got
        assert (b, f"<{RDF}_2>", '"b"') in got
        assert not any(p == f"<{RDF}_3>" for s, p, o in got if s == b)
        # row 3 has no members -> no container at all
        assert not any(s == "<http://example.org/x/3>" and p == "<http://example.org/vals>"
                       for s, p, o in got)
