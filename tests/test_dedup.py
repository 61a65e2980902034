"""Fuzzy dedup goldens (reference tests/unit/datapackage_test.py:139-192)."""

import pytest

from ferc_xbrl_extractor_spark.operators.dedup import (
    dedup_exact,
    fuzzy_dedup,
    fuzzy_dedup_strict,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "c_id string, name string, value string")


def test_fuzzy_picks_most_precise(spark):
    df = _df(
        spark,
        [
            ("a", "cost", "1.0"),
            ("a", "cost", "1.1"),
            ("b", "cost", "2.0"),
            ("b", "cost", "2.1"),
            ("b", "cost", "2.15"),
            ("c", "cost", "3.0"),  # singleton passes through untouched
        ],
    )
    res = fuzzy_dedup(df, ["c_id", "name"])
    got = {r["c_id"]: r["value"] for r in res.resolved.collect()}
    assert got == {"a": "1.1", "b": "2.15", "c": "3.0"}
    assert res.errors.count() == 0


def test_fuzzy_tie_is_error(spark):
    df = _df(spark, [("a", "cost", "1.1"), ("a", "cost", "1.2")])
    res = fuzzy_dedup(df, ["c_id", "name"])
    assert res.resolved.count() == 0
    err = res.errors.first()
    assert sorted(err["values"]) == ["1.1", "1.2"]


def test_fuzzy_string_conflict_is_error(spark):
    df = _df(spark, [("a", "job", "accountant"), ("a", "job", "pringle")])
    res = fuzzy_dedup(df, ["c_id", "name"])
    assert res.resolved.count() == 0
    assert res.errors.count() == 1


def test_fuzzy_strict_raises(spark):
    df = _df(spark, [("a", "job", "accountant"), ("a", "job", "pringle")])
    with pytest.raises(ValueError, match="has values"):
        fuzzy_dedup_strict(df, ["c_id", "name"])


def test_exact_dedup_before_fuzzy(spark):
    # identical repeated values are exact dups, not conflicts
    df = _df(spark, [("a", "cost", "5.0"), ("a", "cost", "5.0")])
    res = fuzzy_dedup(dedup_exact(df), ["c_id", "name"])
    assert res.errors.count() == 0
    assert [r["value"] for r in res.resolved.collect()] == ["5.0"]


def test_fuzzy_integers_unresolvable(spark):
    # all-integer distinct values never isolate at any probe precision
    df = _df(spark, [("a", "n", "1"), ("a", "n", "2")])
    res = fuzzy_dedup(df, ["c_id", "name"])
    assert res.resolved.count() == 0
    assert res.errors.count() == 1
