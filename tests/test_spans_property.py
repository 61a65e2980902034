"""Property test: duplicated-span detection ≡ a brute-force Python oracle.

Small alphabet + short docs force natural cross- and within-document
n-gram collisions; the Spark pipeline (positional gram index → count
window → gap-and-islands) must reproduce the reference exactly on every
generated corpus.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferc_xbrl_extractor_spark.operators import spans as sp

N = 3
ALPHABET = ["a", "b", "c"]

doc_strategy = st.lists(
    st.sampled_from(ALPHABET), min_size=0, max_size=10
).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=6)


def _reference_spans(texts: list[str], n: int, min_count: int):
    grams: dict[tuple[str, ...], int] = {}
    per_doc: list[list[int]] = []
    for text in texts:
        toks = text.split()
        positions = list(range(max(len(toks) - n + 1, 0)))
        per_doc.append(positions)
        for p in positions:
            g = tuple(toks[p : p + n])
            grams[g] = grams.get(g, 0) + 1
    out = set()
    for doc_id, text in enumerate(texts):
        toks = text.split()
        hits = [
            p
            for p in per_doc[doc_id]
            if grams[tuple(toks[p : p + n])] >= min_count
        ]
        start = prev = None
        for p in hits:
            if prev is None or p - prev > n:
                if prev is not None:
                    out.add((doc_id, start, prev + n))
                start = p
            prev = p
        if prev is not None:
            out.add((doc_id, start, prev + n))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=corpus_strategy, min_count=st.integers(min_value=2, max_value=3))
@pytest.mark.slow
def test_duplicated_spans_match_bruteforce(spark, texts, min_count):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in sp.duplicated_spans(df, n=N, min_count=min_count).collect()
    }
    assert got == _reference_spans(texts, N, min_count)
