"""End-to-end replay of the reference's example_mongo_bsbm suite: its
real 530-line mapping (parsed verbatim, including the Jena-lenient
@prefix lines without terminating dots and named logical-source
resources), its real query.sparql (verbatim, including '#' comments),
checked against its recorded result.txt — the only reference-produced
golden output in the repo (morph-xr2rml-dist/example_mongo_bsbm/).

The BSBM source collection itself is NOT shipped in the reference repo
(its testdb_dump.json carries the generic movie fixtures), so the
reviewer documents are reconstructed from result.txt: each expected
binding row (reviewer, name, country) becomes one review with
reviewId == personId — the key relationship the recorded output
requires, because <#Reviewer_Reviewer> builds subjects from
{$.reviewer.personId} while <#Reviewer_name>/<#Reviewer_country> build
them from {$.reviewId} (bsbm-mapping.ttl:504-530), and the query's
three-pattern join over ?reviewer only binds where the two coincide.
"""

import json
import pathlib
import xml.etree.ElementTree as ET

import pytest

from morph_xr2rml_spark.compiler import MappingCompiler
from morph_xr2rml_spark.mapping import parse_mapping
from morph_xr2rml_spark.sources import SourceCatalog
from morph_xr2rml_spark.sparql import sparql_select

BSBM = pathlib.Path("/root/reference/morph-xr2rml-dist/example_mongo_bsbm")
_NS = {"s": "http://www.w3.org/2005/sparql-results#"}


def _expected_rows() -> list[tuple[str, str, str]]:
    tree = ET.parse(BSBM / "result.txt")
    rows = []
    for r in tree.findall(".//s:result", _NS):
        vals = {}
        for b in r.findall("s:binding", _NS):
            u = b.find("s:uri", _NS)
            lit = b.find("s:literal", _NS)
            vals[b.get("name")] = u.text if u is not None else lit.text
        rows.append(
            (vals["reviewer"], vals["reviewername"], vals["reviewercountry"])
        )
    return rows


def _reconstructed_products(rows: list[tuple[str, str, str]]) -> list[str]:
    """One product document per ~5 reviews (exercising the $.reviews.*
    iterator over real arrays)."""
    docs = []
    chunk: list[dict] = []
    for uri, name, country in rows:
        pid = int(uri.rsplit("Reviewer", 1)[1])
        cc = country.rsplit(":", 1)[1]
        chunk.append(
            {
                "reviewId": pid,
                "reviewer": {"personId": pid, "name": name, "country": cc},
            }
        )
        if len(chunk) == 5:
            docs.append(chunk)
            chunk = []
    if chunk:
        docs.append(chunk)
    return [
        json.dumps({"productName": f"Product {i}", "reviews": reviews})
        for i, reviews in enumerate(docs)
    ]


@pytest.fixture(scope="module")
def bsbm_result(spark):
    rows = _expected_rows()
    docs = _reconstructed_products(rows)
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    catalog = SourceCatalog(spark).register("products", df, doc_column="doc")
    mapping = parse_mapping(
        (BSBM / "bsbm-mapping.ttl").read_text(), default_formulation="JSONPath"
    )
    triples = MappingCompiler(spark, mapping, catalog).triples()
    query = (BSBM / "query.sparql").read_text()
    return rows, mapping, triples, sparql_select(triples, query)


def test_mapping_parses_verbatim(bsbm_result):
    _, mapping, _, _ = bsbm_result
    assert len(mapping.triples_maps) == 56
    rev = mapping.triples_maps["#Reviewer_Reviewer"]
    assert rev.logical_source.iterator == "$.reviews.*"
    assert rev.logical_source.value == "db.products.find({})"


def _unlit(term: str) -> str:
    if term.startswith('"'):
        body = term[1:-1]
        for esc, raw in (
            ('\\"', '"'), ("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"),
            ("\\\\", "\\"),
        ):
            body = body.replace(esc, raw)
        return body
    return term.strip("<>")


def test_bsbm_query_reproduces_reference_result(bsbm_result):
    rows, _, _, out = bsbm_result
    got = {
        (
            _unlit(r["reviewer"]),
            _unlit(r["reviewername"]),
            _unlit(r["reviewercountry"]),
        )
        for r in out.collect()
    }
    assert got == set(rows)
    assert len(got) == 53


def test_bsbm_graph_confines_to_review_subtree(bsbm_result):
    # the reconstructed documents carry no product/offer/vendor fields,
    # so only the Review*/Reviewer* triples maps may emit triples —
    # every other TM's template groups are empty (all-empty guard)
    _, _, triples, _ = bsbm_result
    preds = {r["pred"] for r in triples.select("pred").distinct().collect()}
    assert "<http://xmlns.com/foaf/0.1/name>" in preds
    assert (
        "<http://www4.wiwiss.fu-berlin.de/bizer/bsbm/v01/vocabulary/country>"
        in preds
    )
    assert not any("Product" in p and "type" not in p for p in preds)
