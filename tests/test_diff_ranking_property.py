"""Property-based checks for G44 ranking_report and G45 corpus_diff:
hypothesis drives random rankings / random snapshot edits and demands the
distributed relations match straightforward in-memory references.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferc_xbrl_extractor_spark.operators.similarity import ranking_report
from ferc_xbrl_extractor_spark.pipeline.incremental import corpus_diff

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@st.composite
def ranking_case(draw):
    """2-4 queries; each a permutation-ranked candidate list plus a
    judged-relevant set that may include never-retrieved neighbors."""
    case = []
    for q in range(draw(st.integers(2, 4))):
        n = draw(st.integers(0, 6))
        retrieved = list(range(n))
        relevant = draw(
            st.sets(st.integers(0, 9), min_size=1, max_size=5)
        )
        case.append((q, retrieved, sorted(relevant)))
    return case


def _ref_metrics(retrieved, relevant, k):
    mg = [round(1e6 / math.log2(r + 1)) for r in range(1, k + 1)]
    hit_ranks = [
        i + 1 for i, nb in enumerate(retrieved[:k]) if nb in relevant
    ]
    n_hit = len(hit_ranks)
    mrr = round(1.0 / hit_ranks[0], 4) if hit_ranks else 0.0
    dcg = sum(mg[r - 1] for r in hit_ranks)
    idcg = sum(mg[: min(len(relevant), k)])
    ndcg = round(dcg / idcg, 4) if dcg else 0.0
    return len(relevant), n_hit, mrr, ndcg


@settings(**_SETTINGS)
@given(ranking_case(), st.integers(1, 5))
@pytest.mark.slow
def test_ranking_report_matches_reference(spark, case, k):
    res_rows = [
        (q, nb, i + 1) for q, retrieved, _ in case
        for i, nb in enumerate(retrieved)
    ]
    rel_rows = [(q, nb) for q, _, relevant in case for nb in relevant]
    rdf = spark.createDataFrame(
        res_rows or [(99, 0, 1)], "query_id long, neighbor_id long, rank int"
    )
    if not res_rows:
        rdf = rdf.filter("query_id < 0")
    jdf = spark.createDataFrame(rel_rows, "query_id long, neighbor_id long")
    out = {
        r["query_id"]: (r["n_relevant"], r["n_hit"], r["mrr"], r["ndcg"])
        for r in ranking_report(rdf, jdf, k=k).collect()
    }
    assert set(out) == {q for q, _, _ in case}
    for q, retrieved, relevant in case:
        assert out[q] == _ref_metrics(retrieved, relevant, k), (
            q, retrieved, relevant, k, out[q],
        )


@st.composite
def snapshot_case(draw):
    ids = sorted(draw(st.sets(st.integers(0, 30), min_size=1, max_size=15)))
    old = {i: f"text-{draw(st.integers(0, 3))}" for i in ids}
    new = {}
    for i, txt in old.items():
        op = draw(st.integers(0, 3))
        if op == 0:
            continue  # removed
        new[i] = txt + "-edited" if op == 1 else txt
    for _ in range(draw(st.integers(0, 3))):
        new[100 + draw(st.integers(0, 10))] = "fresh"
    return old, new


@settings(**_SETTINGS)
@given(snapshot_case())
@pytest.mark.slow
def test_corpus_diff_matches_reference(spark, case):
    old, new = case
    odf = spark.createDataFrame(
        list(old.items()), "doc_id long, text string"
    )
    ndf = spark.createDataFrame(
        list(new.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["status"] for r in corpus_diff(odf, ndf).collect()
    }
    expect = {}
    for i in set(old) | set(new):
        if i not in old:
            expect[i] = "added"
        elif i not in new:
            expect[i] = "removed"
        elif old[i] != new[i]:
            expect[i] = "changed"
        else:
            expect[i] = "unchanged"
    assert got == expect
