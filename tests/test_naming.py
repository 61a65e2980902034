"""Golden tests for name mangling (reference parity, SURVEY.md §7.4).

Cases mirror /root/reference/tests/unit/datapackage_test.py:195-215 and
the stringcase snakecase contract.
"""

import pytest

from ferc_xbrl_extractor_spark.functions.naming import (
    clean_table_name,
    snakecase,
    strip_xml_prefix,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("FooBar", "foo_bar"),
        ("fooBar", "foo_bar"),
        ("foo bar", "foo_bar"),
        ("foo-bar.baz", "foo_bar_baz"),
        ("ReportDate", "report_date"),
        ("ABC", "a_b_c"),
        ("", ""),
        ("already_snake", "already_snake"),
    ],
)
def test_snakecase(raw, expected):
    assert snakecase(raw) == expected


def test_strip_xml_prefix():
    assert strip_xml_prefix("ferc:RegionAxis") == "RegionAxis"
    assert strip_xml_prefix("NoPrefix") == "NoPrefix"


@pytest.mark.parametrize(
    "raw,expected",
    [
        (
            "Table Name Example - Schedule - 430",
            "430_table_name_example",
        ),
        (
            "Uppercase WORD - Schedule - 1",
            "1_uppercase_word",
        ),
        ("Deprecated Concepts", None),
    ],
)
def test_clean_table_name(raw, expected):
    assert clean_table_name(raw) == expected


def test_clean_table_name_unparseable():
    with pytest.raises(RuntimeError):
        clean_table_name("No Schedule Marker At All")
