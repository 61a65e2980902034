"""G21 unpivot + G22 deletion-neighborhood fuzzy string join."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.operators.analytics import unpivot
from ferc_xbrl_extractor_spark.operators.fuzzyjoin import (
    deletion_signatures,
    fuzzy_string_join,
)

WORDS = [
    "lavender", "lavendar", "chocolate", "chocolat", "spring",
    "sprint", "goldenrod", "golden", "rose", "rosy", "a", "",
]


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [Row(lid=i, lval=w) for i, w in enumerate(WORDS)]
    )
    right = spark.createDataFrame(
        [Row(rid=100 + i, rval=w) for i, w in enumerate(reversed(WORDS))]
    )
    return left, right


def _naive(left, right, d):
    return {
        (r["lid"], r["rid"], r["distance"])
        for r in left.crossJoin(right)
        .withColumn("distance", F.levenshtein("lval", "rval"))
        .filter(F.col("distance") <= d)
        .collect()
    }


@pytest.mark.parametrize("d", [1, 2])
@pytest.mark.slow
def test_fuzzy_join_equals_naive_cross_join(spark, sides, d):
    left, right = sides
    got = {
        (r["lid"], r["rid"], r["distance"])
        for r in fuzzy_string_join(left, right, "lval", "rval", d).collect()
    }
    assert got == _naive(left, right, d)


def test_fuzzy_join_plan_has_no_cartesian(spark, sides):
    left, right = sides
    plan = (
        fuzzy_string_join(left, right, "lval", "rval", 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_rejects_column_collision(spark, sides):
    left, _ = sides
    with pytest.raises(ValueError, match="colliding"):
        fuzzy_string_join(left, left, "lval", "lval", 1)


def test_deletion_signatures_edge_cases(spark):
    df = spark.createDataFrame([Row(s="ab"), Row(s="a"), Row(s="")])
    out = {
        r["s"]: sorted(r["sig"])
        for r in df.select(
            "s", deletion_signatures(F.col("s"), 1).alias("sig")
        ).collect()
    }
    assert out["ab"] == ["a", "ab", "b"]
    assert out["a"] == ["", "a"]
    assert out[""] == [""]


def test_unpivot_golden(spark):
    df = spark.createDataFrame([Row(k=1, x=10.0, y=20.0), Row(k=2, x=30.0, y=None)])
    out = sorted(
        (r["k"], r["name"], r["value"])
        for r in unpivot(df, ["k"], ["x", "y"], "name", "value").collect()
    )
    assert out == [
        (1, "x", 10.0),
        (1, "y", 20.0),
        (2, "x", 30.0),
        (2, "y", None),
    ]


def test_unpivot_no_shuffle(spark):
    df = spark.createDataFrame([Row(k=1, x=1.0, y=2.0)])
    plan = (
        unpivot(df, ["k"], ["x", "y"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


@pytest.mark.slow
def test_fuzzy_join_property_random_strings(spark):
    """Hypothesis: blocked join == naive cross join on random short
    strings over a tiny alphabet (dense edit-distance neighborhoods —
    the adversarial regime for blocking recall)."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abc", min_size=0, max_size=5)

    @settings(max_examples=8, deadline=None)
    @given(
        lefts=st.lists(word, min_size=1, max_size=8, unique=True),
        rights=st.lists(word, min_size=1, max_size=8, unique=True),
        d=st.integers(min_value=1, max_value=2),
    )
    def check(lefts, rights, d):
        from pyspark.sql import Row

        left = spark.createDataFrame([Row(lid=i, lval=w) for i, w in enumerate(lefts)])
        right = spark.createDataFrame([Row(rid=i, rval=w) for i, w in enumerate(rights)])
        got = {
            (r["lid"], r["rid"])
            for r in fuzzy_string_join(left, right, "lval", "rval", d).collect()
        }
        expect = {
            (i, j)
            for i, a in enumerate(lefts)
            for j, b in enumerate(rights)
            if _lev(a, b) <= d
        }
        assert got == expect

    check()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
