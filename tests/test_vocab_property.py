"""Property test: vocab build + integer encoding ≡ a Python reference.

Random small-alphabet corpora force frequency ties (exercising the
(count desc, token asc) id order) and OOV tokens (vocab smaller than the
alphabet); Spark's top-V ids and the broadcast-map encoding must match
the reference on every generated corpus.
"""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferc_xbrl_extractor_spark.operators import vocab as V

ALPHABET = ["aa", "bb", "cc", "dd", "ee"]

doc_strategy = st.lists(
    st.sampled_from(ALPHABET), min_size=0, max_size=8
).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=6)


def _reference(texts: list[str], vocab_size: int):
    counts = Counter(t for text in texts for t in text.split())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ids = {tok: i + 1 for i, (tok, _) in enumerate(ranked[:vocab_size])}
    encoded = [
        [ids.get(t, 0) for t in text.split()] for text in texts
    ]
    return ids, encoded


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    texts=corpus_strategy,
    vocab_size=st.integers(min_value=1, max_value=4),
)
@pytest.mark.slow
def test_vocab_and_encode_match_reference(spark, texts, vocab_size):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    ids, encoded = _reference(texts, vocab_size)

    v = V.build_vocab(df, vocab_size=vocab_size)
    got_ids = {r["token"]: r["token_id"] for r in v.collect()}
    assert got_ids == ids

    enc = {
        r["doc_id"]: list(r["token_ids"])
        for r in V.encode_documents(df, v).collect()
    }
    assert enc == {i: e for i, e in enumerate(encoded)}


def test_decode_roundtrips_in_vocab_documents(spark):
    from pyspark.sql import functions as F

    from ferc_xbrl_extractor_spark.operators import vocab as V

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "beta beta"),
            (3, "alpha zzz-rare beta"),   # OOV token under vocab_size=3
            (4, ""),
        ],
        "doc_id long, text string",
    )
    v = V.build_vocab(docs, vocab_size=3)
    enc = V.encode_documents(docs, v)
    dec = {r["doc_id"]: r["decoded_text"]
           for r in V.decode_documents(enc, v).collect()}
    # whitespace-canonical in-vocab docs round-trip byte-exact
    assert dec[1] == "alpha beta gamma alpha"
    assert dec[2] == "beta beta"
    # OOV renders as <unk>, everything else intact
    assert dec[3] == "alpha <unk> beta"
    assert dec[4] == ""
    # plan shape: the reverse map rides as ONE broadcast row (the only
    # Generate in the plan is the vocab BUILD's explode on the broadcast
    # side — the encoded corpus itself is probed in place, never exploded)
    plan = (
        V.decode_documents(enc, v)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange IdentityBroadcastMode" in plan, plan
