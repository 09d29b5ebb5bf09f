"""Virtual (late) SPARQL evaluation: binder pruning, source-filter
pushdown, and exact equivalence with materialize-then-query.

Reference behavior being re-expressed: MorphBaseRunner.runQuery
(MorphBaseRunner.scala:57-107) -> bindm/bindmTP triple-pattern binding
(MorphBaseTriplePatternBinder.scala:50-213,223-249) -> genCond constant
pushdown (MorphBaseQueryTranslator.scala:227-355) -> evaluate the
original SPARQL over the matched fragments only
(MorphMongoQueryProcessor.scala:45-150)."""

import pytest
from pyspark.sql import functions as F

from morph_xr2rml_spark.compiler.compile import MappingCompiler
from morph_xr2rml_spark.mapping.parser import parse_mapping
from morph_xr2rml_spark.sources.catalog import SourceCatalog
from morph_xr2rml_spark.sparql import sparql_select
from morph_xr2rml_spark.sparql.virtual import VirtualGraph, bind_patterns
from morph_xr2rml_spark.sparql.bgp import parse_sparql

TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .

<#TMDept>
    xrr:logicalSource [ rr:tableName "dept"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [
        rr:template "http://example.org/dept/{dno}";
        rr:class ex:Department;
    ];
    rr:predicateObjectMap [
        rr:predicate ex:deptName;
        rr:objectMap [ rr:column "dname" ];
    ];
    .

<#TMEmp>
    xrr:logicalSource [ rr:tableName "emp"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [
        rr:template "http://example.org/emp/{eid}";
        rr:class ex:Employee;
    ];
    rr:predicateObjectMap [
        rr:predicate ex:name;
        rr:objectMap [ rr:column "ename" ];
    ];
    rr:predicateObjectMap [
        rr:predicate ex:salary;
        rr:objectMap [ rr:column "salary" ];
    ];
    rr:predicateObjectMap [
        rr:predicate ex:dept;
        rr:objectMap [
            rr:parentTriplesMap <#TMDept>;
            rr:joinCondition [ rr:child "dno"; rr:parent "dno" ];
        ];
    ];
    .
"""

PREFIX = "PREFIX ex: <http://example.org/ontology#>\n"


@pytest.fixture(scope="module")
def setup(spark):
    dept = spark.createDataFrame(
        [(1, "Engineering"), (2, "Marketing"), (3, "Legal")],
        "dno int, dname string",
    )
    emp = spark.createDataFrame(
        [
            (10, "alice", 120, 1),
            (11, "bob", 95, 1),
            (12, "carol", 80, 2),
            (13, "dave", 80, 3),
        ],
        "eid int, ename string, salary int, dno int",
    )
    doc = parse_mapping(TTL)
    catalog = (
        SourceCatalog(spark)
        .register("dept", dept, unique_key=["dno"])
        .register("emp", emp, unique_key=["eid"])
    )
    triples = MappingCompiler(spark, doc, catalog).triples()
    return doc, catalog, triples


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# binder pruning
# ---------------------------------------------------------------------------


def test_binder_prunes_by_constant_predicate(setup):
    doc, _c, _t = setup
    q = parse_sparql(PREFIX + "SELECT ?n WHERE { ?e ex:name ?n }")
    bound = bind_patterns(doc, q)
    assert len(bound[0]) == 1
    _tp, tm = bound[0][0]
    assert tm.name.endswith("TMEmp")
    # only the ex:name POM survives; rdf:type branches are pruned
    assert len(tm.predicate_object_maps) == 1
    assert tm.subject_map.class_uris == ()


def test_binder_prunes_by_template_subject(setup):
    doc, _c, _t = setup
    q = parse_sparql(
        PREFIX + "SELECT ?p ?o WHERE { <http://example.org/dept/2> ?p ?o }"
    )
    bound = bind_patterns(doc, q)
    names = {tm.name for _tp, tm in bound[0]}
    assert any(n.endswith("TMDept") for n in names)
    assert not any(n.endswith("TMEmp") for n in names)


def test_binder_keeps_class_for_rdf_type(setup):
    doc, _c, _t = setup
    q = parse_sparql(
        "SELECT ?s WHERE { ?s a <http://example.org/ontology#Employee> }"
    )
    bound = bind_patterns(doc, q)
    assert len(bound[0]) == 1
    _tp, tm = bound[0][0]
    assert tm.subject_map.class_uris == ("http://example.org/ontology#Employee",)
    assert tm.predicate_object_maps == ()


def test_binder_prunes_literal_object_against_iri_map(setup):
    doc, _c, _t = setup
    # ex:dept's object is a RefObjectMap (IRI) — a literal object can
    # never match, so the whole pattern binds nothing
    q = parse_sparql(PREFIX + 'SELECT ?e WHERE { ?e ex:dept "Engineering" }')
    bound = bind_patterns(doc, q)
    assert bound[0] == []


# ---------------------------------------------------------------------------
# equivalence with materialize-then-query
# ---------------------------------------------------------------------------

EQUIV_QUERIES = [
    PREFIX + "SELECT ?n WHERE { ?e ex:name ?n }",
    PREFIX + "SELECT ?e ?n ?d WHERE { ?e ex:name ?n . ?e ex:dept ?d }",
    PREFIX
    + """SELECT ?n ?dn WHERE {
        ?e ex:name ?n . ?e ex:dept ?d . ?d ex:deptName ?dn .
        FILTER(?dn != "Legal")
    }""",
    PREFIX
    + """SELECT ?n ?s WHERE {
        ?e ex:name ?n . OPTIONAL { ?e ex:salary ?s . FILTER(?s > 90) }
    }""",
    PREFIX
    + """SELECT ?x WHERE {
        { ?x ex:deptName "Engineering" } UNION { ?x ex:name "carol" }
    }""",
    "SELECT ?s WHERE { ?s a <http://example.org/ontology#Department> }",
    PREFIX + "SELECT ?o WHERE { <http://example.org/emp/11> ex:dept ?o }",
    PREFIX
    + """SELECT ?d (COUNT(?e) AS ?cnt) WHERE {
        ?e ex:dept ?d
    } GROUP BY ?d ORDER BY ?d""",
    # property path: dept of an employee, then its name (seq path)
    PREFIX + "SELECT ?n ?dn WHERE { ?e ex:name ?n . ?e ex:dept/ex:deptName ?dn }",
    # CONSTANT-subject path: the subject constrains only the first hop —
    # intermediate-hop triples (dept/deptName) have other subjects, so
    # subject-compatibility pruning must be disabled for path patterns
    PREFIX
    + "SELECT ?dn WHERE { <http://example.org/emp/10> ex:dept/ex:deptName ?dn }",
    # inverse path with a constant subject: ^ex:dept puts the pattern
    # subject in the data OBJECT position — TMEmp (whose subjects are
    # emp/{eid}, never dept/…) must stay bound
    PREFIX + "SELECT ?e WHERE { <http://example.org/dept/1> ^ex:dept ?e }",
    # round-5 function surface through the rewriting mode: expression
    # projections and the new built-ins evaluate over the fragment
    # exactly as over materialized triples
    PREFIX
    + """SELECT REDUCED ?n (STRAFTER(STR(?e), "/emp/") AS ?eid)
               (MD5(STR(?n)) AS ?h)
        WHERE { ?e ex:name ?n .
                FILTER(STRLEN(REPLACE(STR(?n), "[aeiou]", "")) >= 0) }""",
]


@pytest.mark.parametrize("query", EQUIV_QUERIES)
def test_virtual_equals_materialized(setup, spark, query):
    doc, catalog, triples = setup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.select(query)) == _rows(sparql_select(triples, query))
    finally:
        vg.release()


def test_virtual_ask(setup, spark):
    doc, catalog, _t = setup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert vg.ask(PREFIX + 'ASK { ?e ex:name "alice" }') is True
        assert vg.ask(PREFIX + 'ASK WHERE { ?e ex:name "zelda" }') is False
    finally:
        vg.release()


def test_virtual_construct(setup, spark):
    doc, catalog, triples = setup
    q = (
        PREFIX
        + """CONSTRUCT { ?e <http://example.org/ontology#in> ?d }
             WHERE { ?e ex:dept ?d }"""
    )
    from morph_xr2rml_spark.sparql import sparql_construct

    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.construct(q)) == _rows(sparql_construct(triples, q))
    finally:
        vg.release()


# ---------------------------------------------------------------------------
# fragment reduction + pushdown
# ---------------------------------------------------------------------------


def test_fragment_is_reduced(setup, spark):
    doc, catalog, triples = setup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(PREFIX + "SELECT ?n WHERE { ?e ex:name ?n }")
        n_frag, n_full = frag.count(), triples.count()
        assert n_frag == 4  # one ex:name triple per employee
        assert n_frag < n_full
    finally:
        vg.release()


def test_constant_subject_pushdown_reaches_source(setup, spark):
    doc, catalog, _t = setup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(
            PREFIX + "SELECT ?n WHERE { <http://example.org/emp/12> ex:name ?n }"
        )
        plan = frag._jdf.queryExecution().optimizedPlan().toString()
        # the template inversion must land on the raw source column —
        # i.e. the filter compares eid BEFORE term construction
        assert "eid" in plan and "12" in plan
        rows = frag.collect()
        assert [r.obj for r in rows] == ['"carol"']
    finally:
        vg.release()


def test_constant_object_pushdown(setup, spark):
    doc, catalog, triples = setup
    q = PREFIX + 'SELECT ?e WHERE { ?e ex:name "bob" }'
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        plan = frag._jdf.queryExecution().optimizedPlan().toString()
        assert "ename" in plan and "bob" in plan
        assert _rows(vg.select(q)) == _rows(sparql_select(triples, q))
    finally:
        vg.release()


def test_no_false_exclusion_on_ambiguous_template(spark):
    # multi-group template: inversion is ambiguous ("1-2" + "3" vs
    # "1" + "2-3"), so NO source pushdown may fire; the residual term
    # filter must still produce the right answer
    ttl = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .
<#TM>
    xrr:logicalSource [ rr:tableName "t"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/x/{a}-{b}" ];
    rr:predicateObjectMap [
        rr:predicate ex:v; rr:objectMap [ rr:column "v" ];
    ];
    .
"""
    t = spark.createDataFrame(
        [("1-2", "3", "first"), ("1", "2-3", "second")],
        "a string, b string, v string",
    )
    doc = parse_mapping(ttl)
    catalog = SourceCatalog(spark).register("t", t)
    vg = VirtualGraph(spark, doc, catalog)
    try:
        rows = _rows(
            vg.select(
                "PREFIX ex: <http://example.org/ontology#>\n"
                "SELECT ?v WHERE { <http://example.org/x/1-2-3> ex:v ?v }"
            )
        )
        assert rows == [('"first"',), ('"second"',)]
    finally:
        vg.release()


def test_zero_length_path_uses_full_graph(setup, spark):
    doc, catalog, triples = setup
    # ex:dept? (zero-or-one) relates every node to itself — predicate
    # pruning must be disabled for the pattern or nodes reachable only
    # via other predicates would vanish
    q = PREFIX + "SELECT ?x ?y WHERE { ?x ex:dept? ?y }"
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.select(q)) == _rows(sparql_select(triples, q))
    finally:
        vg.release()


def test_constant_subject_path_keeps_intermediate_hops(setup, spark):
    """Regression (round-4 advice, high): _bind_detail used to apply
    _subject_compatible even for Path predicates, excluding TMDept from
    the fragment of '<emp/10> ex:dept/ex:deptName ?dn' — the deptName
    hop's subjects are dept IRIs, so the answer came back empty while
    materialize-then-query returned Engineering."""
    doc, catalog, triples = setup
    q = (
        PREFIX
        + "SELECT ?dn WHERE { <http://example.org/emp/10> ex:dept/ex:deptName ?dn }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        assert got == _rows(sparql_select(triples, q))
        assert got == [('"Engineering"',)]
    finally:
        vg.release()


def test_constant_subject_inverse_path(setup, spark):
    doc, catalog, triples = setup
    q = PREFIX + "SELECT ?e WHERE { <http://example.org/dept/1> ^ex:dept ?e }"
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        assert got == _rows(sparql_select(triples, q))
        assert got == [
            ("<http://example.org/emp/10>",),
            ("<http://example.org/emp/11>",),
        ]
    finally:
        vg.release()


def test_rdf_list_patterns_bind_collection_pom(spark):
    ttl = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .
<#TM>
    xrr:logicalSource [ rr:tableName "t"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/s/{k}" ];
    rr:predicateObjectMap [
        rr:predicate ex:items;
        rr:objectMap [ rr:column "item"; rr:termType xrr:RdfList ];
    ];
    .
"""
    t = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k int, item string"
    )
    doc = parse_mapping(ttl)
    catalog = SourceCatalog(spark).register("t", t)
    triples = MappingCompiler(spark, doc, catalog).triples()
    q = (
        "SELECT ?s ?v WHERE { ?s "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?v }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        assert got == _rows(sparql_select(triples, q))
        assert len(got) > 0
    finally:
        vg.release()


# ---------------------------------------------------------------------------
# differential: virtual vs materialized on randomized sources + queries
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_NAMES = ["alice", "bob", "x y", "née", ""]


@settings(max_examples=8, deadline=None)
@given(
    emp_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.sampled_from(_NAMES),
            st.integers(min_value=0, max_value=150),
            st.integers(min_value=1, max_value=4),
        ),
        min_size=0,
        max_size=8,
    ),
    dept_rows=st.lists(
        st.tuples(st.integers(min_value=1, max_value=4), st.sampled_from(_NAMES)),
        min_size=0,
        max_size=4,
        unique_by=lambda r: r[0],
    ),
    qidx=st.integers(min_value=0, max_value=7),
    const_id=st.integers(min_value=0, max_value=6),
    const_name=st.sampled_from(_NAMES),
)
def _virtual_differential(spark, emp_rows, dept_rows, qidx, const_id, const_name):
    emp = spark.createDataFrame(
        emp_rows or [(None, None, None, None)],
        "eid int, ename string, salary int, dno int",
    )
    if not emp_rows:
        emp = emp.where("eid IS NOT NULL")
    dept = spark.createDataFrame(
        dept_rows or [(None, None)], "dno int, dname string"
    )
    if not dept_rows:
        dept = dept.where("dno IS NOT NULL")
    doc = parse_mapping(TTL)
    catalog = (
        SourceCatalog(spark).register("dept", dept).register("emp", emp)
    )
    esc = const_name.replace("\\", "\\\\").replace('"', '\\"')
    queries = [
        PREFIX + "SELECT ?e ?n WHERE { ?e ex:name ?n }",
        PREFIX + f'SELECT ?e WHERE {{ ?e ex:name "{esc}" }}',
        PREFIX
        + f"SELECT ?p ?o WHERE {{ <http://example.org/emp/{const_id}> ?p ?o }}",
        PREFIX
        + "SELECT ?n ?dn WHERE { ?e ex:name ?n . ?e ex:dept/ex:deptName ?dn }",
        PREFIX
        + f"""SELECT ?n WHERE {{
            ?e ex:name ?n .
            OPTIONAL {{ ?e ex:dept ?d . ?d ex:deptName "{esc}" }}
            FILTER(BOUND(?d))
        }}""",
        "SELECT ?s WHERE { ?s a <http://example.org/ontology#Employee> }",
        PREFIX
        + f"""SELECT ?x WHERE {{
            {{ ?x ex:deptName "{esc}" }} UNION {{ ?x ex:salary ?s . FILTER(?s > 90) }}
        }}""",
        PREFIX
        + f"SELECT ?dn WHERE {{ <http://example.org/emp/{const_id}> "
        "ex:dept/ex:deptName ?dn }",
    ]
    q = queries[qidx]
    triples = MappingCompiler(spark, doc, catalog).triples()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        want = _rows(sparql_select(triples, q))
        assert got == want, f"query: {q}\nemp: {emp_rows}\ndept: {dept_rows}"
    finally:
        vg.release()


def test_differential_virtual_vs_materialized(spark):
    _virtual_differential(spark)


# ---------------------------------------------------------------------------
# SPARQL protocol endpoint in rewriting mode (per-request translation,
# SparqlRestService -> MorphBaseRunner.runQuery:57-107 analogue)
# ---------------------------------------------------------------------------


def test_endpoint_serves_virtual_graph(setup, spark):
    import json
    import urllib.parse
    import urllib.request

    from morph_xr2rml_spark.sparql.endpoint import SparqlEndpoint

    doc, catalog, triples = setup
    vg = VirtualGraph(spark, doc, catalog)
    ep = SparqlEndpoint(vg).start()
    try:
        base = f"http://127.0.0.1:{ep.port}/sparql"
        q = PREFIX + "SELECT ?n WHERE { <http://example.org/emp/10> ex:name ?n }"
        with urllib.request.urlopen(
            base + "?query=" + urllib.parse.quote(q)
        ) as r:
            body = json.loads(r.read())
        vals = [b["n"]["value"] for b in body["results"]["bindings"]]
        assert vals == ["alice"]

        with urllib.request.urlopen(
            base + "?query=" + urllib.parse.quote(
                PREFIX + 'ASK { ?e ex:name "bob" }'
            )
        ) as r:
            assert json.loads(r.read())["boolean"] is True

        with urllib.request.urlopen(
            base + "?query=" + urllib.parse.quote(
                "DESCRIBE <http://example.org/dept/1>"
            )
        ) as r:
            nt = r.read().decode()
        from morph_xr2rml_spark.sparql import sparql_describe

        want = {
            f"{r_.subj} {r_.pred} {r_.obj} ."
            for r_ in sparql_describe(
                triples, "http://example.org/dept/1"
            ).collect()
        }
        assert set(nt.strip().splitlines()) == want and want
    finally:
        ep.stop()
        vg.release()


def test_same_tm_patterns_share_one_compilation(setup, spark):
    doc, catalog, triples = setup
    q = (
        PREFIX
        + """SELECT ?e ?n ?s WHERE {
            ?e ex:name ?n . ?e ex:salary ?s . ?e a ex:Employee .
        }"""
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        # three patterns, all binding TMEmp, no pattern-specific source
        # filter -> ONE merged compilation (and one persisted fragment)
        assert len(vg._compilers) == 1
        assert len(vg._persisted) == 1
        assert got == _rows(sparql_select(triples, q))
    finally:
        vg.release()


def test_virtual_over_document_source(spark):
    """Rewriting mode on a document-shaped (MongoDB-style) source: the
    reference's example_mongo mapping with JSONPath references and an
    rml:iterator — binding prunes by predicate, no pushdown is claimed
    (references aren't invertible), answers match materialized."""
    import json as _json
    import pathlib

    mapping = pathlib.Path(
        "/root/reference/morph-xr2rml-dist/example_mongo/mapping.ttl"
    ).read_text()
    from tests.test_compiler_mongo_suite import MOVIE_DOCS, STUDENT_DOCS

    students = spark.createDataFrame(
        [(_json.dumps(d),) for d in STUDENT_DOCS], "doc string"
    )
    movies = spark.createDataFrame(
        [(_json.dumps(d),) for d in MOVIE_DOCS], "doc string"
    )
    catalog = (
        SourceCatalog(spark)
        .register("students", students, doc_column="doc")
        .register("movies", movies, doc_column="doc")
    )
    doc = parse_mapping(mapping, default_formulation="JSONPath")
    triples = MappingCompiler(spark, doc, catalog).triples()
    q = (
        "PREFIX ex: <http://example.com/>\n"
        "SELECT ?s ?a WHERE { ?s ex:activity ?a . ?s a ex:Student }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        assert got == _rows(sparql_select(triples, q))
        assert len(got) == 4
    finally:
        vg.release()


def test_virtual_describe_where_two_phase(setup, spark):
    """DESCRIBE ?var no longer materializes the full graph: the WHERE
    evaluates virtually, the matched nodes are collected (bounded), and
    only branches that can mention them compile — TMEmp's ex:name /
    ex:salary POMs never enter the description plan (round-3 verdict
    missing #2; reference expandDescribe,
    MorphBaseQueryTranslator.scala:86-92)."""
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    doc, catalog, triples = setup
    q = (
        PREFIX
        + "DESCRIBE ?d WHERE { ?e ex:dept ?d . ?e ex:salary ?s . FILTER(?s > 100) }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        out = vg.describe_where(q)
        assert _rows(out) == _rows(sparql_describe_where(triples, q))
        assert ("<http://example.org/dept/1>",
                '"Engineering"') in {(r[0], r[2]) for r in _rows(out)}
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # non-node-producing POMs of TMEmp are never compiled: their
        # predicate IRIs never appear in the description's plan (the
        # LocalRelation leaf lists all source columns either way, so the
        # predicate constants are the compile-or-not evidence)
        assert "ontology#salary" not in plan and "ontology#name" not in plan
        assert "ontology#dept" in plan  # the ROM branch did compile
    finally:
        vg.release()


def test_virtual_describe_where_fallback_above_bound(setup, spark):
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    doc, catalog, triples = setup
    q = PREFIX + "DESCRIBE ?d WHERE { ?e ex:dept ?d }"
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.describe_where(q, max_nodes=1))  # forces fallback
        assert got == _rows(sparql_describe_where(triples, q))
        assert got == _rows(vg.describe_where(q))  # two-phase == fallback
    finally:
        vg.release()


def test_virtual_describe_where_no_match_is_empty(setup, spark):
    doc, catalog, _t = setup
    q = PREFIX + 'DESCRIBE ?e WHERE { ?e ex:name "nobody" }'
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.describe_where(q)) == []
    finally:
        vg.release()


SELFJOIN_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .
<#TMEmp>
    xrr:logicalSource [ rr:tableName "semp"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/emp/{eid}" ];
    rr:predicateObjectMap [
        rr:predicate ex:manager;
        rr:objectMap [ rr:parentTriplesMap <#TMEmp>;
                       rr:joinCondition [ rr:child "mgr"; rr:parent "eid" ] ];
    ];
    rr:predicateObjectMap [
        rr:predicate ex:name; rr:objectMap [ rr:column "name" ];
    ];
    .
"""


def test_selfjoin_rom_subject_pushdown_not_starved(spark):
    """Regression: the pushdown filter replaces the CATALOG entry, so a
    self-join RefObjectMap used to see its parent side filtered by the
    CHILD's subject constraint — '<emp/5> ex:manager ?m' came back empty
    (manager emp/3 was filtered out of the parent scan) while
    materialize-then-query answered emp/3. Pushdown must be skipped when
    a retained ROM's parent reads the same table."""
    semp = spark.createDataFrame(
        [(5, 3, "eve"), (3, 1, "carol"), (1, None, "alice")],
        "eid int, mgr int, name string",
    )
    doc = parse_mapping(SELFJOIN_TTL)
    catalog = SourceCatalog(spark).register("semp", semp, unique_key=["eid"])
    q = (
        PREFIX
        + "SELECT ?m WHERE { <http://example.org/emp/5> ex:manager ?m }"
    )
    triples = MappingCompiler(spark, doc, catalog).triples()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        assert got == _rows(sparql_select(triples, q))
        assert got == [("<http://example.org/emp/3>",)]
        # non-ROM patterns on the same map still push down
        q2 = PREFIX + "SELECT ?n WHERE { <http://example.org/emp/5> ex:name ?n }"
        assert _rows(vg.select(q2)) == [('"eve"',)]
    finally:
        vg.release()


DOCPUSH_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .
<#TMPpl>
    xrr:logicalSource [ xrr:query "db.people.find({})";
                        xrr:referenceFormulation xrr:JSONPath ];
    rr:subjectMap [ rr:template "http://example.org/person/{$.id}" ];
    rr:predicateObjectMap [
        rr:predicate ex:name; rr:objectMap [ xrr:reference "$.name" ];
    ];
    rr:predicateObjectMap [
        rr:predicate ex:age; rr:objectMap [ xrr:reference "$.age" ];
    ];
    .
"""

# exactness probes for _doc_value_filter: JSON null (no term), missing
# field (no subject), float formatting (40.0 vs "40"), nested objects,
# values the IRI encoding leaves alone
_PPL_DOCS = [
    '{"id": 1, "name": "alice", "age": 30}',
    '{"id": 2, "name": "bob", "age": 40.0}',
    '{"id": 3, "name": null, "age": null}',
    '{"id": 4, "name": "d e", "age": 30}',
    '{"name": "ghost", "age": 30}',
    '{"id": 6, "name": {"first": "zoe"}, "age": true}',
]


@pytest.fixture(scope="module")
def docpush(spark):
    ppl = spark.createDataFrame([(d,) for d in _PPL_DOCS], "doc string")
    doc = parse_mapping(DOCPUSH_TTL)
    catalog = SourceCatalog(spark).register("people", ppl, doc_column="doc")
    triples = MappingCompiler(spark, doc, catalog).triples()
    return doc, catalog, triples


def test_doc_source_subject_pushdown_reaches_scan(docpush, spark):
    """Constant subject over a find() source: the inverted template
    filter lands on the raw document column (get_json_object at the
    scan), the Catalyst-native analogue of the reference pushing the
    constant into the Mongo query (JsonPathToMongoTranslator.scala:
    242-463). Round-3 verdict missing #1."""
    doc, catalog, triples = docpush
    q = PREFIX + "SELECT ?n WHERE { <http://example.org/person/2> ex:name ?n }"
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        plan = frag._jdf.queryExecution().optimizedPlan().toString()
        assert "get_json_object" in plan and "Filter" in plan
        got = _rows(vg.select(q))
        assert got == _rows(sparql_select(triples, q))
        assert got == [('"bob"',)]
    finally:
        vg.release()


def test_doc_source_object_pushdown(docpush, spark):
    doc, catalog, triples = docpush
    q = (
        PREFIX
        + 'SELECT ?p WHERE { ?p ex:age "30"^^<http://www.w3.org/2001/XMLSchema#integer> }'
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        plan = frag._jdf.queryExecution().optimizedPlan().toString()
        assert "get_json_object" in plan and "Filter" in plan
        assert _rows(vg.select(q)) == _rows(sparql_select(triples, q))
    finally:
        vg.release()


@pytest.mark.parametrize(
    "q",
    [
        # float formatting: term is "40.0" (Python str), doc says 40.0
        PREFIX + "SELECT ?n WHERE { <http://example.org/person/2> ex:name ?n }",
        # JSON-null name: no term; subject 3 exists through ex:age? (also null)
        PREFIX + "SELECT ?n WHERE { <http://example.org/person/3> ex:name ?n }",
        # value with a space: not UNRESERVED, pushdown declines, residual exact
        PREFIX + 'SELECT ?p WHERE { ?p ex:name "d e" }',
        # boolean-valued field as object
        PREFIX + 'SELECT ?p WHERE { ?p ex:age "true" }',
        # object-valued field (compact-JSON literal)
        PREFIX + "SELECT ?a WHERE { <http://example.org/person/6> ex:age ?a }",
        # every person (no constants at all)
        PREFIX + "SELECT ?p ?n WHERE { ?p ex:name ?n }",
    ],
)
def test_doc_pushdown_no_false_exclusion(docpush, spark, q):
    doc, catalog, triples = docpush
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.select(q)) == _rows(sparql_select(triples, q))
    finally:
        vg.release()


# ---------------------------------------------------------------------------
# GRAPH patterns (quad-mode fragments)
# ---------------------------------------------------------------------------

GRAPHS_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .

<#TMEmpG>
    xrr:logicalSource [ rr:tableName "emp"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/emp/{eid}" ];
    rr:predicateObjectMap [
        rr:predicate ex:name;
        rr:objectMap [ rr:column "ename" ];
        rr:graph ex:gNames;
    ];
    rr:predicateObjectMap [
        rr:predicate ex:salary;
        rr:objectMap [ rr:column "salary" ];
        rr:graph ex:gKeys;
    ];
    rr:predicateObjectMap [
        rr:predicate ex:deptno;
        rr:objectMap [ rr:column "dno" ];
    ];
    .
"""


@pytest.fixture(scope="module")
def gsetup(spark):
    emp = spark.createDataFrame(
        [
            (10, "alice", 120, 1),
            (11, "bob", 95, 1),
            (12, "carol", 80, 2),
        ],
        "eid int, ename string, salary int, dno int",
    )
    doc = parse_mapping(GRAPHS_TTL)
    catalog = SourceCatalog(spark).register("emp", emp, unique_key=["eid"])
    quads = MappingCompiler(spark, doc, catalog).quads()
    return doc, catalog, quads


@pytest.mark.parametrize(
    "q",
    [
        # constant graph
        "SELECT ?s ?n WHERE { GRAPH ex:gNames { ?s ex:name ?n } }",
        # graph variable binds
        "SELECT ?g ?s ?v WHERE { GRAPH ?g { ?s ?p ?v } }",
        # default-graph pattern joined with a named-graph pattern
        "SELECT ?s ?d ?v WHERE { ?s ex:deptno ?d . "
        "GRAPH ex:gKeys { ?s ex:salary ?v } }",
        # GRAPH inside OPTIONAL
        "SELECT ?s ?d ?n WHERE { ?s ex:deptno ?d . "
        "OPTIONAL { GRAPH ex:gNames { ?s ex:name ?n } } }",
    ],
)
def test_virtual_graph_patterns_match_materialized(gsetup, spark, q):
    doc, catalog, quads = gsetup
    q = PREFIX + q
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.select(q)) == _rows(sparql_select(quads, q))
    finally:
        vg.release()


def test_virtual_graph_prunes_incompatible_branches(gsetup, spark):
    """GRAPH <g> keeps only POMs whose graph maps can emit into <g>;
    default-graph patterns exclude named-graph-only POMs. Both checked
    on the fragment itself, not just the final answer."""
    doc, catalog, _quads = gsetup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(
            PREFIX + "SELECT ?s ?n WHERE { GRAPH ex:gNames { ?s ?p ?n } }"
        )
        preds = {r.pred for r in frag.select("pred").distinct().collect()}
        assert preds == {"<http://example.org/ontology#name>"}
    finally:
        vg.release()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(
            PREFIX
            + "SELECT ?s ?v WHERE { ?s ?p ?v . GRAPH ?g { ?s ex:salary ?v } }"
        )
        by_graph = dict(
            frag.groupBy(F.col("graph").isNull().alias("dflt")).count().collect()
        )
        # default-graph half only carries ex:deptno; named half only salary
        assert set(by_graph) == {True, False}
    finally:
        vg.release()


def test_virtual_graph_unmatchable_constant_compiles_nothing(gsetup, spark):
    doc, catalog, _quads = gsetup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(
            PREFIX + "SELECT ?s WHERE { GRAPH ex:gOther { ?s ex:name ?n } }"
        )
        assert not vg._compilers  # pruned before any source scan
        assert frag.count() == 0
        assert frag.columns == ["subj", "pred", "obj", "graph"]
    finally:
        vg.release()


@settings(max_examples=6, deadline=None)
@given(
    emp_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.sampled_from(_NAMES),
            st.integers(min_value=0, max_value=150),
            st.integers(min_value=1, max_value=4),
        ),
        min_size=0,
        max_size=8,
    ),
    qidx=st.integers(min_value=0, max_value=3),
)
def _virtual_graph_differential(spark, emp_rows, qidx):
    emp = spark.createDataFrame(
        emp_rows or [(None, None, None, None)],
        "eid int, ename string, salary int, dno int",
    )
    if not emp_rows:
        emp = emp.where("eid IS NOT NULL")
    doc = parse_mapping(GRAPHS_TTL)
    catalog = SourceCatalog(spark).register("emp", emp)
    queries = [
        PREFIX + "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s ?p ?o } }",
        PREFIX + "SELECT ?s ?n WHERE { GRAPH ex:gNames { ?s ?p ?n } }",
        PREFIX + "SELECT ?s ?d ?v WHERE { ?s ex:deptno ?d . "
        "GRAPH ex:gKeys { ?s ex:salary ?v } }",
        PREFIX + "SELECT ?s ?v WHERE { GRAPH ?g { ?s ex:salary ?v } "
        "FILTER(?v > 90) }",
    ]
    q = queries[qidx]
    quads = MappingCompiler(spark, doc, catalog).quads()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        want = _rows(sparql_select(quads, q))
        assert got == want, f"query: {q}\nemp: {emp_rows}"
    finally:
        vg.release()


def test_differential_virtual_graph(spark):
    _virtual_graph_differential(spark)


@pytest.mark.parametrize(
    "q",
    [
        # FROM merges named graphs into the queried default graph
        "SELECT ?s ?v FROM ex:gKeys WHERE { ?s ex:salary ?v }",
        "SELECT ?s ?x FROM ex:gNames FROM ex:gKeys WHERE { ?s ?p ?x }",
        # FROM NAMED restricts GRAPH ?g; the store default graph is out
        "SELECT ?g ?s ?x FROM NAMED ex:gNames WHERE { GRAPH ?g { ?s ?p ?x } }",
        # both clauses at once
        "SELECT ?n ?v FROM ex:gNames FROM NAMED ex:gKeys "
        "WHERE { ?s ex:name ?n . GRAPH ?g { ?s ex:salary ?v } }",
    ],
)
def test_virtual_dataset_clauses_match_materialized(gsetup, spark, q):
    doc, catalog, quads = gsetup
    q = PREFIX + q
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.select(q)) == _rows(sparql_select(quads, q))
    finally:
        vg.release()


def test_virtual_dataset_clause_prunes(gsetup, spark):
    """FROM <gKeys> makes the default graph = gKeys only: the gNames
    and store-default branches are pruned at bind time, and a GRAPH
    constant outside FROM NAMED compiles nothing at all."""
    doc, catalog, _quads = gsetup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(
            PREFIX + "SELECT ?s ?v FROM ex:gKeys WHERE { ?s ?p ?v }"
        )
        preds = {r.pred for r in frag.select("pred").distinct().collect()}
        assert preds == {"<http://example.org/ontology#salary>"}
    finally:
        vg.release()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(
            PREFIX
            + "SELECT ?v FROM NAMED ex:gNames "
            "WHERE { GRAPH ex:gKeys { ?s ?p ?v } }"
        )
        assert not vg._compilers
        assert frag.count() == 0
    finally:
        vg.release()


def test_virtual_construct_dataset_clause(gsetup, spark):
    from morph_xr2rml_spark.sparql import sparql_construct

    doc, catalog, quads = gsetup
    q = (
        PREFIX + "CONSTRUCT { ?s ex:pay ?v } FROM ex:gKeys "
        "WHERE { ?s ex:salary ?v }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert _rows(vg.construct(q)) == _rows(sparql_construct(quads, q))
        assert len(_rows(vg.construct(q))) == 3
    finally:
        vg.release()


def test_virtual_ask_with_dataset_clause(gsetup, spark):
    doc, catalog, _quads = gsetup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        assert vg.ask(PREFIX + "ASK FROM ex:gKeys { ?s ex:salary ?v }")
        assert not vg.ask(PREFIX + "ASK FROM ex:gKeys { ?s ex:name ?v }")
        assert vg.ask(PREFIX + "ASK WHERE { ?s ex:deptno ?d }")
        assert vg.ask(PREFIX + "ASK { ?s ex:deptno ?d }")
    finally:
        vg.release()


def test_virtual_ask_keyword_anchored_past_prologue(setup, spark):
    doc, catalog, _t = setup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        q = (
            "PREFIX ask: <http://x/ask/>\n"
            + PREFIX
            + 'ASK { ?e ex:name "alice" }'
        )
        assert vg.ask(q) is True
    finally:
        vg.release()


def test_constant_pushdown_survives_to_parquet_scan(spark, tmp_path):
    """The key filter compares in the COLUMN's type (dno = 1), not via a
    column-side string cast — so it reaches the parquet reader as a
    PushedFilter and a constant-subject query reads only matching row
    groups at scale. The exact residual keeps the answer tight."""
    import re as _re

    spark.createDataFrame(
        [(1, "Engineering"), (2, "Marketing")], "dno int, dname string"
    ).write.parquet(str(tmp_path / "dept"))
    spark.createDataFrame(
        [(10, "alice", 120, 1)], "eid int, ename string, salary int, dno int"
    ).write.parquet(str(tmp_path / "emp"))
    doc = parse_mapping(TTL)
    catalog = (
        SourceCatalog(spark)
        .register("dept", spark.read.parquet(str(tmp_path / "dept")),
                  unique_key=["dno"])
        .register("emp", spark.read.parquet(str(tmp_path / "emp")),
                  unique_key=["eid"])
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(
            PREFIX + "SELECT ?n WHERE { <http://example.org/dept/1> ex:deptName ?n }"
        )
        fmt = spark._sc._jvm.PythonSQLUtils.explainString(
            frag._jdf.queryExecution(), "formatted"
        )
        pushed = [
            ln for ln in fmt.splitlines() if "PushedFilters" in ln
        ]
        assert any(_re.search(r"(In|EqualTo)\(dno", ln) for ln in pushed), fmt
        assert [r.obj for r in frag.collect()] == ['"Engineering"']
    finally:
        vg.release()


def test_describe_nodes_pushdown_scans_keys(spark, tmp_path):
    """Two-phase DESCRIBE pushes the inverted node keys into the
    described map's own parquet scan AND into ROM parents' scans, so a
    k-node description reads O(k) source rows."""
    import re as _re

    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    spark.createDataFrame(
        [(1, "Engineering"), (2, "Marketing"), (3, "Legal")],
        "dno int, dname string",
    ).write.parquet(str(tmp_path / "dept"))
    spark.createDataFrame(
        [(10, "alice", 120, 1), (11, "bob", 95, 1), (12, "carol", 80, 2)],
        "eid int, ename string, salary int, dno int",
    ).write.parquet(str(tmp_path / "emp"))
    doc = parse_mapping(TTL)
    catalog = (
        SourceCatalog(spark)
        .register("dept", spark.read.parquet(str(tmp_path / "dept")),
                  unique_key=["dno"])
        .register("emp", spark.read.parquet(str(tmp_path / "emp")),
                  unique_key=["eid"])
    )
    q = (
        PREFIX
        + "DESCRIBE ?d WHERE { ?e ex:dept ?d . ?e ex:salary ?s . FILTER(?s > 100) }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        out = vg.describe_where(q)
        fmt = spark._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        pushed = [ln for ln in fmt.splitlines() if "PushedFilters" in ln]
        # the dept scans (own subject scan + the ROM parent side) carry
        # the node-key IN filter
        assert any(_re.search(r"(In|EqualTo)\(dno", ln) for ln in pushed), fmt
        # exact equivalence with materialize-then-describe
        comp = MappingCompiler(spark, doc, catalog)
        try:
            want = {tuple(r) for r in sparql_describe_where(comp.triples(), q).collect()}
        finally:
            comp.release()
        assert {tuple(r) for r in out.collect()} == want
        assert ("<http://example.org/dept/1>",
                '"Engineering"') in {(r[0], r[2]) for r in out.collect()}
    finally:
        vg.release()


TEAM_TTL = TTL + """\

<#TMTeam>
    xrr:logicalSource [ rr:tableName "team"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/team/{tid}" ];
    rr:predicateObjectMap [
        rr:predicate ex:members;
        rr:objectMap [
            xrr:reference "Column(members)/JSONPath($.*)";
            rr:termType xrr:RdfList;
            xrr:nestedTermMap [ rr:termType rr:IRI ];
        ];
    ];
    .
"""


def test_describe_includes_collection_member_arcs(spark):
    """A described node that appears as an rdf:first MEMBER of another
    map's RDF list must surface that membership arc: the collection POM
    joins the object branches whenever its members' term type can be an
    IRI (previously only blank-node describes kept collection POMs, so
    IRI-membered lists silently vanished from two-phase DESCRIBE)."""
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    dept = spark.createDataFrame(
        [(1, "Engineering")], "dno int, dname string"
    )
    emp = spark.createDataFrame(
        [(10, "alice", 120, 1), (11, "bob", 95, 1)],
        "eid int, ename string, salary int, dno int",
    )
    team = spark.createDataFrame(
        [(7, '["http://example.org/emp/10", "http://example.org/emp/11"]')],
        "tid int, members string",
    )
    doc = parse_mapping(TEAM_TTL)
    catalog = (
        SourceCatalog(spark)
        .register("dept", dept, unique_key=["dno"])
        .register("emp", emp, unique_key=["eid"])
        .register("team", team, unique_key=["tid"])
    )
    q = PREFIX + "DESCRIBE ?e WHERE { ?e ex:salary ?s . FILTER(?s > 100) }"
    vg = VirtualGraph(spark, doc, catalog)
    comp = MappingCompiler(spark, doc, catalog)
    try:
        got = {tuple(r) for r in vg.describe_where(q).collect()}
        want = {
            tuple(r)
            for r in sparql_describe_where(comp.triples(), q).collect()
        }
        assert got == want
        # the membership arc itself: some chain bnode rdf:first alice
        first = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
        assert any(
            p == first and o == "<http://example.org/emp/10>"
            and s.startswith("_:")
            for s, p, o in got
        ), got
    finally:
        comp.release()
        vg.release()


@settings(max_examples=6, deadline=None)
@given(
    emp_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.sampled_from(_NAMES),
            st.integers(min_value=0, max_value=150),
            st.integers(min_value=1, max_value=4),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda r: r[0],
    ),
    dept_rows=st.lists(
        st.tuples(st.integers(min_value=1, max_value=4), st.sampled_from(_NAMES)),
        min_size=0,
        max_size=4,
        unique_by=lambda r: r[0],
    ),
    salary_cut=st.integers(min_value=0, max_value=150),
    which=st.integers(min_value=0, max_value=1),
    max_nodes=st.sampled_from([1, 10_000]),
)
def _describe_differential(
    spark, emp_rows, dept_rows, salary_cut, which, max_nodes
):
    """Two-phase virtual DESCRIBE == materialize-then-describe on
    randomized sources, over a mapping with a RefObjectMap AND an
    IRI-membered RDF list (emp IRIs as rdf:first members), at both the
    two-phase path and the forced bounded fallback (max_nodes=1)."""
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    emp = spark.createDataFrame(
        emp_rows or [(None, None, None, None)],
        "eid int, ename string, salary int, dno int",
    )
    if not emp_rows:
        emp = emp.where("eid IS NOT NULL")
    dept = spark.createDataFrame(
        dept_rows or [(None, None)], "dno int, dname string"
    )
    if not dept_rows:
        dept = dept.where("dno IS NOT NULL")
    team = spark.createDataFrame(
        [(7, '["http://example.org/emp/1", "http://example.org/emp/2"]'),
         (8, '["http://example.org/emp/3"]')],
        "tid int, members string",
    )
    doc = parse_mapping(TEAM_TTL)
    catalog = (
        SourceCatalog(spark)
        .register("dept", dept)
        .register("emp", emp)
        .register("team", team)
    )
    q = PREFIX + (
        f"DESCRIBE ?e WHERE {{ ?e ex:salary ?s . FILTER(?s > {salary_cut}) }}"
        if which == 0
        else f"DESCRIBE ?d WHERE {{ ?e ex:dept ?d . ?e ex:salary ?s . "
        f"FILTER(?s > {salary_cut}) }}"
    )
    comp = MappingCompiler(spark, doc, catalog)
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.describe_where(q, max_nodes=max_nodes))
        want = _rows(sparql_describe_where(comp.triples(), q))
        assert got == want, f"q: {q}\nemp: {emp_rows}\ndept: {dept_rows}"
    finally:
        comp.release()
        vg.release()


def test_differential_virtual_describe(spark):
    _describe_differential(spark)


def test_constant_projection_answers_from_mapping(setup, spark):
    """§4.1 Constant Projection / Projection Pushing
    (allVarsProjectedAsConstantTermMaps,
    MorphBaseQueryTranslator.scala:398-470): with the opt-in flag, the
    schema-exploration queries SELECT DISTINCT ?p / ?t answer from the
    MAPPING alone — zero triples-map compilations, zero source scans —
    and still match the materialized answer (sources here non-empty, the
    rewrite's documented assumption)."""
    from morph_xr2rml_spark.compiler.compile import CompileOptions

    doc, catalog, triples = setup
    vg = VirtualGraph(
        spark, doc, catalog, CompileOptions(constant_projection=True)
    )
    try:
        q = "SELECT DISTINCT ?p WHERE { ?s ?p ?o }"
        got = _rows(vg.select(q))
        assert vg._compilers == []  # never compiled a source
        assert got == _rows(sparql_select(triples, q))
        assert ("<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",) in got
        assert ("<http://example.org/ontology#dept>",) in got

        # rr:class constants at the object position
        qt = "SELECT DISTINCT ?t WHERE { ?s a ?t }"
        got_t = _rows(vg.select(qt))
        assert vg._compilers == []
        assert got_t == _rows(sparql_select(triples, qt))

        # LIMIT applies to the VALUES frame
        assert len(vg.select(q + " LIMIT 2").collect()) == 2
        assert vg._compilers == []

        # a data-dependent position falls through to the normal path
        qn = PREFIX + "SELECT DISTINCT ?n WHERE { ?s ex:name ?n }"
        got_n = _rows(vg.select(qn))
        assert vg._compilers != []  # really evaluated
        assert got_n == _rows(sparql_select(triples, qn))
    finally:
        vg.release()


def test_constant_projection_off_by_default(setup, spark):
    doc, catalog, _t = setup
    vg = VirtualGraph(spark, doc, catalog)
    try:
        vg.select("SELECT DISTINCT ?p WHERE { ?s ?p ?o }").collect()
        assert vg._compilers != []  # default: ordinary evaluation
    finally:
        vg.release()


DBLDEPT_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .

<#TMDept>
    xrr:logicalSource [ rr:tableName "ddept"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/dept/{dno}" ];
    rr:predicateObjectMap [
        rr:predicate ex:deptName;
        rr:objectMap [ rr:column "dname" ];
    ];
    .
"""


def test_typed_pushdown_double_keys_exact(spark):
    """The typed key filter on a DOUBLE column is a SUPERSET of the
    lexical equality (cast('2' as double) also matches the row whose
    lexical form is '2.0'), and the exact residual removes the slack:
    <dept/2> matches nothing because the row's subject IRI is
    <dept/2.0>, while <dept/1.5> and <dept/2.0> hit their rows."""
    ddept = spark.createDataFrame(
        [(1.5, "Eng"), (2.0, "Mkt"), (10000000.0, "Big")],
        "dno double, dname string",
    )
    doc = parse_mapping(DBLDEPT_TTL)
    catalog = SourceCatalog(spark).register("ddept", ddept)
    triples = MappingCompiler(spark, doc, catalog).triples()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        for subj, want in [
            ("dept/1.5", [('"Eng"',)]),
            ("dept/2.0", [('"Mkt"',)]),
            ("dept/2", []),        # superset filter hit, residual removes
            # integral doubles lexicalize via the long-cast convention
            # (lex_value_col): 1.0e7 -> "10000000.0", never "1.0E7"
            ("dept/10000000.0", [('"Big"',)]),
            ("dept/1.0E7", []),
            ("dept/10000000", []),
        ]:
            q = (
                PREFIX
                + f"SELECT ?n WHERE {{ <http://example.org/{subj}> ex:deptName ?n }}"
            )
            got = _rows(vg.select(q))
            assert got == _rows(sparql_select(triples, q)), subj
            assert sorted(got) == sorted(want), (subj, got)
    finally:
        vg.release()


def test_describe_class_node_keeps_rdf_type_arcs(setup, spark):
    """Describing a node that is an rr:class IRI must include the
    '?s rdf:type <node>' arcs (subj|obj semantics, same as the
    materialized fallback): object_branches previously stripped
    class_uris unconditionally, so the result depended on max_nodes."""
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    doc, catalog, triples = setup
    q = PREFIX + "DESCRIBE ?t WHERE { ?s a ?t }"
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.describe_where(q))
        assert got == _rows(sparql_describe_where(triples, q))
        assert (
            "<http://example.org/emp/10>",
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
            "<http://example.org/ontology#Employee>",
        ) in got
        assert (
            "<http://example.org/dept/2>",
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
            "<http://example.org/ontology#Department>",
        ) in got
    finally:
        vg.release()


def test_virtual_describe_where_comment_between_vars_and_where(setup, spark):
    """Same comment-robustness as the materialized path: the SELECT
    rewrite runs on the comment-stripped text the detection saw."""
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    doc, catalog, triples = setup
    commented = (
        PREFIX + "DESCRIBE ?d  # which departments\nWHERE { ?e ex:dept ?d }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.describe_where(commented))
        assert got == _rows(sparql_describe_where(triples, commented))
        assert ("<http://example.org/dept/1>",
                "<http://example.org/ontology#deptName>",
                '"Engineering"') in got
    finally:
        vg.release()


def test_constant_projection_restricted_to_single_free_pattern(setup, spark):
    """The mapping-only rewrite is UNSOUND when the WHERE constrains
    solutions in a data-dependent way: a co-pattern sharing ?s, or a
    constant subject/object, must fall through to real evaluation (the
    reference inspects the joined abstract query,
    MorphBaseQueryTranslator.scala:398-470)."""
    from morph_xr2rml_spark.compiler.compile import CompileOptions

    doc, catalog, triples = setup
    opts = CompileOptions(constant_projection=True)

    # co-pattern: nobody has this name, so the true DISTINCT answer is
    # empty — the old rewrite returned every mapped predicate
    vg = VirtualGraph(spark, doc, catalog, opts)
    try:
        q = PREFIX + (
            'SELECT DISTINCT ?p WHERE { ?s ?p ?o . ?s ex:name "nobody" }'
        )
        got = _rows(vg.select(q))
        assert vg._compilers != []  # really evaluated, not mapping-only
        assert got == _rows(sparql_select(triples, q)) == []
    finally:
        vg.release()

    # constant object selects rows the mapping alone cannot decide
    vg = VirtualGraph(spark, doc, catalog, opts)
    try:
        q = PREFIX + 'SELECT DISTINCT ?p WHERE { ?s ?p "nobody" }'
        got = _rows(vg.select(q))
        assert vg._compilers != []
        assert got == _rows(sparql_select(triples, q)) == []
    finally:
        vg.release()

    # repeated variable joins two positions: fall through
    vg = VirtualGraph(spark, doc, catalog, opts)
    try:
        q = "SELECT DISTINCT ?p WHERE { ?s ?p ?s }"
        got = _rows(vg.select(q))
        assert vg._compilers != []
        assert got == _rows(sparql_select(triples, q)) == []
    finally:
        vg.release()


def test_fragment_persist_released_at_request_boundary(setup, spark):
    """fragment()'s shared-fragment persist registers with the session
    cache registry, so an endpoint's release_since at its request
    boundary reclaims it even when nothing calls VirtualGraph.release()
    — a long-lived serve_virtual must not leak one cached frame per
    multi-pattern request."""
    from morph_xr2rml_spark.plans import caching

    doc, catalog, _t = setup
    vg = VirtualGraph(spark, doc, catalog)
    mark = caching.job_mark()
    df = vg.select(
        PREFIX + "SELECT ?n ?s WHERE { ?e ex:name ?n . ?e ex:salary ?s }"
    )
    df.collect()
    assert vg._persisted, "expected the shared fragment to be persisted"
    assert all(f.storageLevel.useMemory for f in vg._persisted)
    caching.release_since(mark)
    assert all(not f.storageLevel.useMemory for f in vg._persisted)


# ---------------------------------------------------------------------------
# cross-pattern condition propagation
# (AbstractQueryAtomicMongo.propagateConditionFromJoinedQuery:269-316,
#  MorphMongoQueryTranslator.scala:426-431; taxref query.sparql:36-41)
# ---------------------------------------------------------------------------

# the taxref shape: one map's subject AND its prefLabel object template
# read the same source column, a second map shares the subject template
PROP_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .

<#TMTaxon>
    xrr:logicalSource [ rr:tableName "taxa"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/taxon/{code}" ];
    rr:predicateObjectMap [
        rr:predicate ex:prefLabel;
        rr:objectMap [ rr:template "http://example.org/label/{code}" ];
    ];
    .

<#TMAlt>
    xrr:logicalSource [ rr:tableName "alts"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/taxon/{code}" ];
    rr:predicateObjectMap [
        rr:predicate ex:altLabel;
        rr:objectMap [ rr:template "http://example.org/label/{alt}" ];
    ];
    .
"""


def _prop_setup(spark, tmp_path):
    spark.createDataFrame(
        [(60585, "a"), (60586, "b"), (60587, "c")], "code int, x string"
    ).write.parquet(str(tmp_path / "taxa"))
    spark.createDataFrame(
        [(60585, 1), (60585, 2), (60586, 3)], "code int, alt int"
    ).write.parquet(str(tmp_path / "alts"))
    doc = parse_mapping(PROP_TTL)
    catalog = (
        SourceCatalog(spark)
        .register("taxa", spark.read.parquet(str(tmp_path / "taxa")),
                  unique_key=["code"])
        .register("alts", spark.read.parquet(str(tmp_path / "alts")))
    )
    return doc, catalog


def _pushed_filters(spark, df):
    fmt = spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return fmt, [ln for ln in fmt.splitlines() if "PushedFilters" in ln]


def _scan_filters_by_table(spark, df):
    """{parquet directory basename: [PushedFilters lines]} per scan node
    of the formatted plan."""
    fmt = spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out: dict[str, list[str]] = {}
    loc = None
    for ln in fmt.splitlines():
        if "Location:" in ln:
            loc = ln.rstrip("]").rstrip("/").rsplit("/", 1)[-1]
        elif "PushedFilters" in ln and loc is not None:
            out.setdefault(loc, []).append(ln)
    return fmt, out


def test_condition_propagation_filters_both_scans(spark, tmp_path):
    """``?t ex:prefLabel <label/60585> . ?t ex:altLabel ?a``: the
    constant inverts on TMTaxon to code=60585; since TMAlt's subject
    uses the SAME template, the equality propagates and BOTH parquet
    scans carry a typed code filter (the reference's 'very big inner
    join but with propagation of conditions' shape)."""
    import re as _re

    doc, catalog = _prop_setup(spark, tmp_path)
    q = (
        PREFIX + "SELECT ?t ?a WHERE { "
        "?t ex:prefLabel <http://example.org/label/60585> . "
        "?t ex:altLabel ?a }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        fmt, pushed = _pushed_filters(spark, frag)
        hits = [ln for ln in pushed if _re.search(r"(In|EqualTo)\(code", ln)]
        assert len(hits) >= 2, fmt  # both sources' scans are key-filtered
        got = _rows(vg.select(q))
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = _rows(sparql_select(comp.triples(), q))
    finally:
        comp.release()
    assert got == want
    assert got == [
        (
            "<http://example.org/taxon/60585>",
            "<http://example.org/label/1>",
        ),
        (
            "<http://example.org/taxon/60585>",
            "<http://example.org/label/2>",
        ),
    ]


def test_constant_iri_object_pushdown_filters_own_scan(spark, tmp_path):
    """A constant IRI object inverts the object map's template into a
    typed key filter on the pattern's own scan (the taxref
    'no propagation applies' shape still reduces ITS source)."""
    import re as _re

    doc, catalog = _prop_setup(spark, tmp_path)
    q = (
        PREFIX + "SELECT ?t WHERE { "
        "?t ex:altLabel <http://example.org/label/2> }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        fmt, pushed = _pushed_filters(spark, frag)
        assert any(_re.search(r"(In|EqualTo)\(alt", ln) for ln in pushed), fmt
        got = _rows(vg.select(q))
    finally:
        vg.release()
    assert got == [("<http://example.org/taxon/60585>",)]


def test_propagation_not_derived_from_optional_patterns(spark, tmp_path):
    """A constant inside OPTIONAL constrains nothing outside it: no
    propagated filter may reach the required pattern's scan, and the
    answer still matches materialize-then-query."""
    import re as _re

    doc, catalog = _prop_setup(spark, tmp_path)
    q = (
        PREFIX + "SELECT ?t ?a WHERE { ?t ex:altLabel ?a . "
        "OPTIONAL { ?t ex:prefLabel <http://example.org/label/60585> } }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        fmt, by_table = _scan_filters_by_table(spark, frag)
        # the required alts scan must NOT be key-filtered (60586's row is
        # an answer); the OPTIONAL's own taxa scan may keep its constant
        assert not any(
            _re.search(r"(In|EqualTo)\(code", ln)
            for ln in by_table.get("alts", [])
        ), fmt
        got = _rows(vg.select(q))
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = _rows(sparql_select(comp.triples(), q))
    finally:
        comp.release()
    assert got == want
    assert ("<http://example.org/taxon/60586>",
            "<http://example.org/label/3>") in got


def test_propagation_into_optional_and_union_branches(spark, tmp_path):
    """The propagated constraint from a REQUIRED pattern filters
    OPTIONAL- and UNION-side scans too (their solutions only matter when
    compatible with the required pattern), with answers exact."""
    doc, catalog = _prop_setup(spark, tmp_path)
    q = (
        PREFIX + "SELECT ?t ?a WHERE { "
        "?t ex:prefLabel <http://example.org/label/60586> . "
        "OPTIONAL { ?t ex:altLabel ?a } }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = _rows(sparql_select(comp.triples(), q))
    finally:
        comp.release()
    assert got == want
    assert got == [
        (
            "<http://example.org/taxon/60586>",
            "<http://example.org/label/3>",
        ),
    ]


def test_propagation_requires_same_template(spark, tmp_path):
    """Bindings whose subject templates differ from the constrained
    variable's template are left unfiltered (different templates can
    render the same term), and answers stay exact."""
    ttl = PROP_TTL.replace(
        'rr:template "http://example.org/taxon/{code}" ];\n    rr:predicateObjectMap [\n        rr:predicate ex:altLabel',
        'rr:template "http://example.org/taxon-alt/{code}" ];\n    rr:predicateObjectMap [\n        rr:predicate ex:altLabel',
    )
    assert "taxon-alt" in ttl
    doc = parse_mapping(ttl)
    spark.createDataFrame(
        [(60585, "a")], "code int, x string"
    ).write.parquet(str(tmp_path / "taxa2"))
    spark.createDataFrame(
        [(60585, 1)], "code int, alt int"
    ).write.parquet(str(tmp_path / "alts2"))
    catalog = (
        SourceCatalog(spark)
        .register("taxa", spark.read.parquet(str(tmp_path / "taxa2")))
        .register("alts", spark.read.parquet(str(tmp_path / "alts2")))
    )
    q = (
        PREFIX + "SELECT ?t ?a WHERE { "
        "?t ex:prefLabel <http://example.org/label/60585> . "
        "?t ex:altLabel ?a }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = _rows(sparql_select(comp.triples(), q))
    finally:
        comp.release()
    # different subject templates -> the join is empty, and both modes agree
    assert got == want == []


def test_describe_nodes_semi_join_above_isin_bound(spark, tmp_path):
    """Above _ISIN_MAX matched nodes the two-phase DESCRIBE restricts
    with a broadcast LEFT SEMI join against the node set instead of a
    thousands-element literal isin serialized into every task, and the
    answer stays exactly the materialized DESCRIBE's."""
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    n = VirtualGraph._ISIN_MAX + 200
    spark.range(n).selectExpr(
        "cast(id as int) as dno", "concat('dept-', id) as dname"
    ).write.parquet(str(tmp_path / "dept"))
    spark.createDataFrame(
        [(10, "alice", 120, 1)], "eid int, ename string, salary int, dno int"
    ).write.parquet(str(tmp_path / "emp"))
    doc = parse_mapping(TTL)
    catalog = (
        SourceCatalog(spark)
        .register("dept", spark.read.parquet(str(tmp_path / "dept")),
                  unique_key=["dno"])
        .register("emp", spark.read.parquet(str(tmp_path / "emp")),
                  unique_key=["eid"])
    )
    q = PREFIX + "DESCRIBE ?d WHERE { ?d ex:deptName ?n }"
    vg = VirtualGraph(spark, doc, catalog)
    try:
        out = vg.describe_where(q)
        fmt = spark._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "LeftSemi" in fmt, fmt
        # no thousands-element literal IN reaches the plan
        assert "dept-777" not in fmt
        got = {tuple(r) for r in out.collect()}
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = {
            tuple(r)
            for r in sparql_describe_where(comp.triples(), q).collect()
        }
    finally:
        comp.release()
    assert got == want
    assert len(got) >= 2 * n  # type + name arcs for every dept


def test_describe_nodes_small_set_keeps_key_pushdown(spark, tmp_path):
    """At or below _ISIN_MAX the typed node-key scan pushdown stays (a
    k-node DESCRIBE reads O(k) source rows)."""
    import re as _re

    spark.createDataFrame(
        [(1, "Engineering"), (2, "Marketing"), (3, "Legal")],
        "dno int, dname string",
    ).write.parquet(str(tmp_path / "dept"))
    spark.createDataFrame(
        [(10, "alice", 120, 1)], "eid int, ename string, salary int, dno int"
    ).write.parquet(str(tmp_path / "emp"))
    doc = parse_mapping(TTL)
    catalog = (
        SourceCatalog(spark)
        .register("dept", spark.read.parquet(str(tmp_path / "dept")),
                  unique_key=["dno"])
        .register("emp", spark.read.parquet(str(tmp_path / "emp")),
                  unique_key=["eid"])
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        out = vg._describe_nodes(["<http://example.org/dept/2>"])
        fmt, pushed = _pushed_filters(spark, out)
        assert any(_re.search(r"(In|EqualTo)\(dno", ln) for ln in pushed), fmt
        rows = {tuple(r) for r in out.collect()}
    finally:
        vg.release()
    assert ("<http://example.org/dept/2>",
            "<http://example.org/ontology#deptName>",
            '"Marketing"') in rows


# ---------------------------------------------------------------------------
# randomized differentials for the round-4/5 code paths: DESCRIBE-WHERE
# and dataset clauses over DOCUMENT sources, and condition propagation
# (round-4 verdict, next-round #8)
# ---------------------------------------------------------------------------

DOC_DESCRIBE_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .

<#TMDoc>
    xrr:logicalSource [ xrr:query "db.items.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/doc/{$.id}" ];
    rr:predicateObjectMap [
        rr:predicate ex:name; rr:objectMap [ xrr:reference "$.name" ] ];
    rr:predicateObjectMap [
        rr:predicate ex:tag;
        rr:objectMap [ rr:template "http://example.org/tag/{$.tag}" ] ];
    rr:predicateObjectMap [
        rr:predicate ex:val; rr:objectMap [ xrr:reference "$.val" ] ];
    .

<#TMTag>
    xrr:logicalSource [ xrr:query "db.items.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/tag/{$.tag}" ];
    rr:predicateObjectMap [
        rr:predicate ex:label; rr:objectMap [ xrr:reference "$.tag" ] ];
    .
"""

_TAGS = ["red", "blue", "x y", ""]


def _doc_catalog(spark, rows):
    """items collection from (id, name?, tag?, val?) tuples; None drops
    the key from the document (missing-field case)."""
    import json as _json

    docs = []
    for rid, name, tag, val in rows:
        d = {"id": rid}
        if name is not None:
            d["name"] = name
        if tag is not None:
            d["tag"] = tag
        if val is not None:
            d["val"] = val
        docs.append((_json.dumps(d),))
    df = spark.createDataFrame(docs or [("",)], "doc string")
    if not docs:
        df = df.where("doc <> ''")
    return SourceCatalog(spark).register("items", df, doc_column="doc")


_DOC_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.one_of(st.none(), st.sampled_from(_NAMES)),
        st.one_of(st.none(), st.sampled_from(_TAGS)),
        st.one_of(
            st.none(),
            st.integers(min_value=-3, max_value=120),
            st.sampled_from([0.5, 2.0, 1e3]),
        ),
    ),
    min_size=0,
    max_size=7,
)


@settings(max_examples=8, deadline=None)
@given(rows=_DOC_ROWS, qidx=st.integers(min_value=0, max_value=3),
       cut=st.integers(min_value=-1, max_value=100),
       bound=st.sampled_from([1, 10_000]))
def _doc_describe_differential(spark, rows, qidx, cut, bound):
    """Two-phase virtual DESCRIBE == materialize-then-describe over a
    find() document source, at the two-phase path AND the forced
    bounded fallback, with missing fields and numeric values in play."""
    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    doc = parse_mapping(DOC_DESCRIBE_TTL, default_formulation="JSONPath")
    catalog = _doc_catalog(spark, rows)
    queries = [
        PREFIX + "DESCRIBE ?s WHERE { ?s ex:tag ?t }",
        PREFIX + "DESCRIBE ?t WHERE { ?s ex:tag ?t }",
        PREFIX
        + f"DESCRIBE ?s WHERE {{ ?s ex:val ?v . FILTER(?v > {cut}) }}",
        PREFIX + "DESCRIBE ?t ?s WHERE { ?s ex:tag ?t . ?s ex:name ?n }",
    ]
    q = queries[qidx]
    comp = MappingCompiler(spark, doc, catalog)
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.describe_where(q, max_nodes=bound))
        want = _rows(sparql_describe_where(comp.triples(), q))
        assert got == want, f"q: {q}\nrows: {rows}\nbound: {bound}"
    finally:
        comp.release()
        vg.release()


def test_differential_doc_describe(spark):
    _doc_describe_differential(spark)


DOC_GRAPHS_TTL = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .

<#TMDocG>
    xrr:logicalSource [ xrr:query "db.items.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/doc/{$.id}" ];
    rr:predicateObjectMap [
        rr:predicate ex:name; rr:objectMap [ xrr:reference "$.name" ];
        rr:graph ex:gNames ];
    rr:predicateObjectMap [
        rr:predicate ex:val; rr:objectMap [ xrr:reference "$.val" ];
        rr:graph ex:gVals ];
    rr:predicateObjectMap [
        rr:predicate ex:tag;
        rr:objectMap [ rr:template "http://example.org/tag/{$.tag}" ] ];
    .
"""


@settings(max_examples=8, deadline=None)
@given(rows=_DOC_ROWS, qidx=st.integers(min_value=0, max_value=4))
def _doc_dataset_differential(spark, rows, qidx):
    """FROM / FROM NAMED over a document source: virtual == materialized
    quads under every dataset-clause shape, including ones selecting no
    graph at all."""
    doc = parse_mapping(DOC_GRAPHS_TTL, default_formulation="JSONPath")
    catalog = _doc_catalog(spark, rows)
    queries = [
        PREFIX + "SELECT ?s ?v FROM ex:gVals WHERE { ?s ex:val ?v }",
        PREFIX
        + "SELECT ?s ?x FROM ex:gNames FROM ex:gVals WHERE { ?s ?p ?x }",
        PREFIX + "SELECT ?g ?s ?x FROM NAMED ex:gNames "
        "WHERE { GRAPH ?g { ?s ?p ?x } }",
        PREFIX + "SELECT ?n ?v FROM ex:gNames FROM NAMED ex:gVals "
        "WHERE { ?s ex:name ?n . GRAPH ?g { ?s ex:val ?v } }",
        # a FROM graph no branch can emit into: provably empty
        PREFIX + "SELECT ?s ?x FROM ex:gOther WHERE { ?s ?p ?x }",
    ]
    q = queries[qidx]
    quads = MappingCompiler(spark, doc, catalog).quads()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        want = _rows(sparql_select(quads, q))
        assert got == want, f"q: {q}\nrows: {rows}"
    finally:
        vg.release()


def test_differential_doc_dataset_clauses(spark):
    _doc_dataset_differential(spark)


@settings(max_examples=8, deadline=None)
@given(
    taxa=st.lists(
        st.tuples(st.integers(min_value=1, max_value=6),
                  st.sampled_from(_NAMES)),
        min_size=0, max_size=6, unique_by=lambda r: r[0],
    ),
    alts=st.lists(
        st.tuples(st.integers(min_value=1, max_value=6),
                  st.integers(min_value=1, max_value=9)),
        min_size=0, max_size=8,
    ),
    cid=st.integers(min_value=1, max_value=6),
    c2=st.integers(min_value=1, max_value=9),
    qidx=st.integers(min_value=0, max_value=4),
)
def _propagation_differential(spark, taxa, alts, cid, c2, qidx):
    """Condition propagation soundness on randomized sources: every
    query shape that triggers (or must NOT trigger) the cross-pattern
    scan filter agrees exactly with materialize-then-query — including
    MINUS/UNION/OPTIONAL placements of the shared variable."""
    doc = parse_mapping(PROP_TTL)
    taxa_df = spark.createDataFrame(
        taxa or [(None, None)], "code int, x string"
    )
    if not taxa:
        taxa_df = taxa_df.where("code IS NOT NULL")
    alts_df = spark.createDataFrame(alts or [(None, None)], "code int, alt int")
    if not alts:
        alts_df = alts_df.where("code IS NOT NULL")
    catalog = (
        SourceCatalog(spark)
        .register("taxa", taxa_df)
        .register("alts", alts_df)
    )
    L = "http://example.org/label"
    queries = [
        PREFIX + f"SELECT ?t ?a WHERE {{ ?t ex:prefLabel <{L}/{cid}> . "
        "?t ex:altLabel ?a }",
        PREFIX + f"SELECT ?t ?p WHERE {{ ?t ex:prefLabel ?p . "
        f"?t ex:altLabel <{L}/{c2}> }}",
        PREFIX + f"SELECT ?t ?a WHERE {{ ?t ex:prefLabel <{L}/{cid}> . "
        "OPTIONAL { ?t ex:altLabel ?a } }",
        PREFIX + f"SELECT ?t ?a WHERE {{ ?t ex:prefLabel <{L}/{cid}> . "
        f"?t ex:altLabel ?a . MINUS {{ ?t ex:altLabel <{L}/{c2}> }} }}",
        PREFIX + f"SELECT ?t WHERE {{ ?t ex:prefLabel <{L}/{cid}> . "
        f"{{ ?t ex:altLabel <{L}/{c2}> }} UNION {{ ?t ex:prefLabel ?p }} }}",
    ]
    q = queries[qidx]
    triples = MappingCompiler(spark, doc, catalog).triples()
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
        want = _rows(sparql_select(triples, q))
        assert got == want, f"q: {q}\ntaxa: {taxa}\nalts: {alts}"
    finally:
        vg.release()


def test_differential_condition_propagation(spark):
    _propagation_differential(spark)


def test_empty_template_group_value_not_pruned(spark):
    """Pinned from the doc-DESCRIBE differential's falsifying example:
    a reference evaluating to the EMPTY STRING still renders a term
    (only None drops it), so the binder must not prune branches whose
    template matches the IRI with an empty group value — in DESCRIBE
    (both phases' paths) and in SELECT constant patterns."""
    import json as _json

    from morph_xr2rml_spark.sparql.bgp import sparql_describe_where

    doc = parse_mapping(DOC_DESCRIBE_TTL, default_formulation="JSONPath")
    df = spark.createDataFrame(
        [(_json.dumps({"id": 0, "tag": ""}),)], "doc string"
    )
    catalog = SourceCatalog(spark).register("items", df, doc_column="doc")
    q = PREFIX + "DESCRIBE ?t WHERE { ?s ex:tag ?t }"
    comp = MappingCompiler(spark, doc, catalog)
    vg = VirtualGraph(spark, doc, catalog)
    try:
        want = _rows(sparql_describe_where(comp.triples(), q))
        assert want  # the materializer emits the empty-group term
        assert _rows(vg.describe_where(q, max_nodes=1)) == want
        assert _rows(vg.describe_where(q)) == want
        sel = PREFIX + (
            "SELECT ?s WHERE { ?s ex:tag <http://example.org/tag/> }"
        )
        got = _rows(vg.select(sel))
        assert got == _rows(sparql_select(comp.triples(), sel))
        assert got == [("<http://example.org/doc/0>",)]
    finally:
        comp.release()
        vg.release()


def test_values_inline_data_pushes_node_keys(spark, tmp_path):
    """Top-level VALUES constrains its variable in every solution, so
    the inverted node keys reach each binding's scan as a typed IN
    filter — the rewriting analogue of pushing the VALUES join into the
    source read."""
    import re as _re

    doc, catalog = _prop_setup(spark, tmp_path)
    q = (
        PREFIX + "SELECT ?t ?a WHERE { "
        "VALUES ?t { <http://example.org/taxon/60585> "
        "<http://example.org/taxon/60586> } "
        "?t ex:altLabel ?a }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        fmt, by_table = _scan_filters_by_table(spark, frag)
        assert any(
            _re.search(r"In\(code, \[60585,60586\]", ln)
            for ln in by_table.get("alts", [])
        ), fmt
        got = _rows(vg.select(q))
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = _rows(sparql_select(comp.triples(), q))
    finally:
        comp.release()
    assert got == want
    assert {r[0] for r in got} == {
        "<http://example.org/taxon/60585>",
        "<http://example.org/taxon/60586>",
    }


def test_values_with_undef_or_literals_not_pushed(spark, tmp_path):
    """UNDEF rows (or non-IRI rows) leave the variable unconstrained —
    no scan filter may fire, and answers stay exact."""
    import re as _re

    doc, catalog = _prop_setup(spark, tmp_path)
    q = (
        PREFIX + "SELECT ?t ?a WHERE { "
        "VALUES ?t { <http://example.org/taxon/60585> UNDEF } "
        "?t ex:altLabel ?a }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        frag = vg.fragment(q)
        fmt, by_table = _scan_filters_by_table(spark, frag)
        assert not any(
            _re.search(r"(In|EqualTo)\(code", ln)
            for ln in by_table.get("alts", [])
        ), fmt
        got = _rows(vg.select(q))
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = _rows(sparql_select(comp.triples(), q))
    finally:
        comp.release()
    assert got == want
    # UNDEF joins with every taxon that has an alt label
    assert ("<http://example.org/taxon/60586>",
            "<http://example.org/label/3>") in got


def test_values_unmatchable_term_filters_branch_to_nothing(spark, tmp_path):
    """A VALUES term no template can render keys an empty IN set (the
    branch provably contributes nothing), and the answer is empty in
    both modes."""
    doc, catalog = _prop_setup(spark, tmp_path)
    q = (
        PREFIX + "SELECT ?t ?a WHERE { "
        "VALUES ?t { <http://example.org/other/1> } "
        "?t ex:altLabel ?a }"
    )
    vg = VirtualGraph(spark, doc, catalog)
    try:
        got = _rows(vg.select(q))
    finally:
        vg.release()
    comp = MappingCompiler(spark, doc, catalog)
    try:
        want = _rows(sparql_select(comp.triples(), q))
    finally:
        comp.release()
    assert got == want == []
