"""Fuzzy dedup goldens (reference tests/unit/datapackage_test.py:139-192)."""

import pytest

from ferc_xbrl_extractor_spark.operators.dedup import (
    dedup_exact,
    fuzzy_dedup,
    fuzzy_dedup_strict,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "c_id string, name string, value string")


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over pair graphs
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators.neardup import (  # noqa: E402
    attach_clusters,
    connected_components,
    dedup_by_pairs,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_cc_two_components(spark):
    labels = connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


@pytest.mark.slow
def test_cc_chain_needs_iterations(spark):
    # A 7-node path: the min label must travel 6 hops, exercising the
    # multi-round propagation (one round would only move it one hop).
    chain = [(i, i + 1) for i in range(1, 7)]
    labels = connected_components(_pairs(spark, chain))
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {i: 1 for i in range(1, 8)}


def test_cc_matches_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(40))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(45)})

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expected = {
        n: min(members) for members in comp.values() for n in members
        if len(members) > 1 or any(n in e for e in edges)
    }
    in_graph = {n for e in edges for n in e}
    expected = {n: lab for n, lab in expected.items() if n in in_graph}

    labels = connected_components(_pairs(spark, edges))
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == expected


def test_cc_unconverged_raises(spark):
    chain = [(i, i + 1) for i in range(1, 7)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_iter=2)


def test_dedup_by_pairs_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(0, 1), (1, 2), (4, 5)])
    kept = sorted(r["doc_id"] for r in dedup_by_pairs(docs, pairs).collect())
    assert kept == [0, 3, 4]

    clustered = attach_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster"] for r in clustered.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
