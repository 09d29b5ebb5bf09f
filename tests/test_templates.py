"""Template machinery tests — ported from the reference's JUnit suite
morph-core/src/test/scala/.../TemplateUtilityTest.scala (175 LoC)."""

from morph_xr2rml_spark.functions import templates as T

XPATH = r"XPath(\/\/root\/node[1]\(\)\/@id)"
JSONPATH = r"JSONPath($['store'].book[\(@.length-1\)].title)"
MIXED = "Column(NAME)/CSV(3)/" + XPATH + "/" + JSONPATH + "/TSV(name)"


def test_get_template_groups_pure_jsonpath():
    tpl = "http://example.org/student/{$.*}"
    assert T.get_template_groups(tpl) == ["$.*"]


def test_get_template_groups_mixed():
    tpl = "http://example.org/student/{ID}/{" + MIXED + "}/{ID2}/{" + MIXED + "}"
    groups = T.get_template_groups(tpl)
    assert groups == ["ID", MIXED, "ID2", MIXED]


def test_get_template_columns_simple():
    tpl = "http://www4.wiwiss.fu-berlin.de/bizer/bsbm/v01/instances/{ar}/{nr}"
    assert T.get_template_columns(tpl) == ["ar", "nr"]


def test_get_template_columns_mixed():
    tpl = "http://example.org/student/{ID}/{" + MIXED + "}/{ID2}/{" + MIXED + "}"
    assert T.get_template_columns(tpl) == ["ID", "NAME", "ID2", "NAME"]


def test_get_template_matching():
    groups = T.get_template_matching(
        "http://example.org/student/{ID1}/{ID2}/{ID1}",
        "http://example.org/student/id1/id2/id1",
    )
    assert groups["ID1"] == "id1"
    assert groups["ID2"] == "id2"

    assert (
        T.get_template_matching(
            "http://example.org/student/{ID1}", "http://foo.com/student/id1"
        )
        == {}
    )


def test_cartesian_product():
    combos = T.cartesian_product([["1", "2", "3"], ["4"], ["5", "6"]])
    assert combos == [
        ["1", "4", "5"],
        ["1", "4", "6"],
        ["2", "4", "5"],
        ["2", "4", "6"],
        ["3", "4", "5"],
        ["3", "4", "6"],
    ]
    combos2 = T.cartesian_product([["1", "2", "3"], []])
    assert combos2 == [["1", ""], ["2", ""], ["3", ""]]


def test_replace_template_groups_straight():
    tpl = "http://example.org/student/{ID}/{" + MIXED + "}/{ID2}/{" + MIXED + "}"
    values = T.replace_template_groups(
        tpl, [["A"], ["12", "34"], ["B", "C"], ["D"]]
    )
    assert values == [
        "http://example.org/student/A/12/B/D",
        "http://example.org/student/A/12/C/D",
        "http://example.org/student/A/34/B/D",
        "http://example.org/student/A/34/C/D",
    ]


def test_replace_template_groups_edge_cases():
    # one empty replacement -> empty string substituted
    assert T.replace_template_groups("{A}-{B}-{C}", [["A"], [], ["D"]]) == ["A--D"]
    # more values than groups -> extras ignored
    assert T.replace_template_groups("{A}-{B}", [["a"], ["b"], ["c"]]) == ["a-b"]
    # more groups than values -> template unchanged
    assert T.replace_template_groups("{A}-{B}-{C}", [["a"], ["b"]]) == ["{A}-{B}-{C}"]
    # no replacements -> template unchanged
    assert T.replace_template_groups("{A}", []) == ["{A}"]


def test_compatible_template_strings():
    assert not T.compatible_template_strings(
        "http://example.org/student/{xx}", "http://example.org/{yy}/{34}"
    )
    assert not T.compatible_template_strings(
        "http://example.org/student/{xx}",
        "http://example.org/student/{yy}/{34}/B{tt}",
    )
    assert T.compatible_template_strings(
        "http://example.org/student/{xx}/{12}/B{zz}",
        "http://example.org/student/{yy}/{34}/B{tt}",
    )
    tpl = "http://example.org/student/{ID}/{" + MIXED + "}/{ID2}/{" + MIXED + "}"
    assert T.compatible_template_strings(tpl, tpl)
