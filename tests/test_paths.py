"""Mixed-syntax-path tests — ported from the reference's JUnit suites
morph-core/src/test/scala/.../path/MixedSyntaxPathTest.scala (188 LoC),
JSONPath_PathExpressionTest.scala, CSVPath/TSVPath tests."""

from morph_xr2rml_spark.functions.paths import (
    MIXED_SYNTAX_PATH_RE,
    MixedSyntaxPath,
    REFFORMULATION_COLUMN,
    REFFORMULATION_JSONPATH,
    REFFORMULATION_XPATH,
    unescape_path_chars,
)

XPATH = r"XPath(\/\/root\/node[1]\(\)\/@id)"
JSONPATH = r"JSONPath($['store'].book[\(@.length-1\)].title)"
MIXED = "Column(NAME)/CSV(3)/" + XPATH + "/" + JSONPATH + "/TSV(name)"


def test_regex_matches():
    assert len(MIXED_SYNTAX_PATH_RE.findall(XPATH)) == 1
    assert len(MIXED_SYNTAX_PATH_RE.findall(JSONPATH)) == 1
    assert len(list(MIXED_SYNTAX_PATH_RE.finditer(MIXED))) == 5
    assert len(MIXED_SYNTAX_PATH_RE.findall("NAME")) == 0


def test_unescape():
    assert unescape_path_chars(r"\/\/root\(x\)\{y\}") == "//root(x){y}"


def test_referenced_column():
    msp = MixedSyntaxPath.parse(MIXED, REFFORMULATION_COLUMN)
    assert msp.referenced_column == "NAME"
    assert [s.kind for s in msp.steps] == ["Column", "CSV", "XPath", "JSONPath", "TSV"]
    # escaped chars restored in step expressions
    assert msp.steps[2].expr == "//root/node[1]()/@id"


def test_simple_column():
    msp = MixedSyntaxPath.parse("NAME", REFFORMULATION_COLUMN)
    assert msp.is_simple_column
    assert msp.evaluate("one simple value") == ["one simple value"]
    assert msp.evaluate(None) == []
    assert msp.evaluate("") == []


def test_evaluate_col_json():
    jsonval = '[{ "name" : "john", "age": 28}, { "name" : "lucie", "isMale": false}]'
    msp = MixedSyntaxPath.parse("Column(NAME)/JSONPath($.*.*)", REFFORMULATION_COLUMN)
    assert msp.evaluate(jsonval) == ["john", 28, "lucie", False]


def test_evaluate_jsonpath_wildcards():
    doc = '{"FullName": {"FirstNames": ["Paul","Jack"], "LastName": "Smith"}}'
    msp = MixedSyntaxPath.parse("$.FullName.FirstNames.*", REFFORMULATION_JSONPATH)
    assert msp.evaluate(doc) == ["Paul", "Jack"]


def test_jsonpath_reserialization():
    doc = '{"a": [1, 2], "b": {"x": "y"}}'
    msp = MixedSyntaxPath.parse("$.*", REFFORMULATION_JSONPATH)
    assert msp.evaluate(doc) == ["[1,2]", '{"x":"y"}']


def test_jsonpath_missing_path_empty():
    msp = MixedSyntaxPath.parse("$.nothere.*", REFFORMULATION_JSONPATH)
    assert msp.evaluate('{"a": 1}') == []


def test_evaluate_col_xpath():
    value = """
        <People>
            <Person id="John1" type="admin">
                <firstname>John</firstname>
                <lastname>Watson</lastname>
                <age>30</age>
                <email>johnwatson@sh.com</email>
            </Person>
            <Person id="2222">
                <firstname>Paul</firstname>
                <email>boo@foo.com</email>
                <age>40</age>
            </Person>
            <Person id="Abou">
                <firstname>Abou</firstname>
            </Person>
        </People>"""
    msp = MixedSyntaxPath.parse(
        r"Column(NAME)/XPath(\/\/Person[email]\/firstname)", REFFORMULATION_COLUMN
    )
    assert msp.evaluate(value) == ["John", "Paul"]


def test_evaluate_json_inside_xpath():
    value = """
        <People>
            <Person id="John1" type="admin">
                <details>
                    { "firstname" : "John", "lastname": "Watson", "age": 28}
                </details>
                <email>johnwatson@sh.com</email>
            </Person>
            <Person id="2222">
                <details>
                    { "firstname" : "Lucie", "gender": "female", "age": 34}
                </details>
                <email>boo@foo.com</email>
            </Person>
        </People>"""
    msp = MixedSyntaxPath.parse(
        r"XPath(\/\/Person\/details)/JSONPath($.firstname)", REFFORMULATION_XPATH
    )
    assert msp.evaluate(value) == ["John", "Lucie"]


def test_csv_by_index():
    msp = MixedSyntaxPath.parse("Column(code)/CSV(1)", REFFORMULATION_COLUMN)
    assert msp.evaluate("B, BSK, BK") == ["BSK"]
    # multi-row CSV: one element per record
    assert msp.evaluate("a, b\nc, d") == ["b", "d"]
    # out-of-range index => []
    assert msp.evaluate("only-one-cell") == []


def test_csv_quoting():
    msp = MixedSyntaxPath.parse("Column(code)/CSV(1)", REFFORMULATION_COLUMN)
    assert msp.evaluate('aaa, "b,bb", ccc') == ["b,bb"]


def test_tsv():
    msp = MixedSyntaxPath.parse("Column(code)/TSV(2)", REFFORMULATION_COLUMN)
    assert msp.evaluate("a\tb\tc") == ["c"]


def test_xpath_subtree_serialization():
    value = "<Root><A><B>x</B><B>y</B></A></Root>"
    msp = MixedSyntaxPath.parse(r"XPath(\/\/A)", REFFORMULATION_XPATH)
    assert msp.evaluate(value) == ["<A><B>x</B><B>y</B></A>"]


def test_multi_step_multiplicity():
    # each value of step1 feeds step2; results concatenated in order
    value = '{"rows": ["a,b", "c,d"]}'
    msp = MixedSyntaxPath.parse(
        "JSONPath($.rows.*)/CSV(0)", REFFORMULATION_JSONPATH
    )
    assert msp.evaluate(value) == ["a", "c"]
