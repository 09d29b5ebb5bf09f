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
