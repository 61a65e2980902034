"""Property test: corpus-wide paragraph dedup ≡ a brute-force Python
oracle.

A tiny paragraph alphabet forces heavy cross-document repetition; the
Spark pipeline (posexplode → min(struct) survivor aggregate → semi join
→ positional reassembly) must keep exactly the globally-first
(doc_id, pos) occurrence of every distinct trimmed paragraph and rebuild
documents byte-exactly, on every generated corpus — including documents
that dedup to empty and whitespace-only paragraphs that never count.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferc_xbrl_extractor_spark.operators.text import paragraph_dedup

SEP = "\n\n"
PARAS = ["alpha", "beta b", "gamma", "  ", ""]

doc_strategy = st.lists(
    st.sampled_from(PARAS), min_size=0, max_size=5
).map(SEP.join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=5)


def _reference(texts: list[str]) -> dict[int, tuple[str, int]]:
    seen: set[str] = set()
    out: dict[int, tuple[str, int]] = {}
    for doc_id, text in enumerate(texts):
        kept = []
        for para in text.split(SEP):
            key = para.strip()
            if not key:
                continue
            if key not in seen:
                seen.add(key)
                kept.append(para)
        out[doc_id] = (SEP.join(kept), len(kept))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus_strategy)
@pytest.mark.slow
def test_paragraph_dedup_matches_bruteforce(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept_paragraphs"])
        for r in paragraph_dedup(df).collect()
    }
    assert got == _reference(texts)
