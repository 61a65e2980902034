"""Property-based check of the fuzzy-dedup closed form.

The engine resolves conflicts with window expressions (a closed form over
decimal-digit counts); the reference resolves them with an imperative
round-probe loop (datapackage.py:548-575: for precision 0..5, keep values
where round(v, p) != v; if exactly one survives, it wins; strings or no
unique survivor raise). Hypothesis drives both with random value sets and
demands identical outcomes — the strongest guard on the engine's one
custom aggregate.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferc_xbrl_extractor_spark.operators.dedup import fuzzy_dedup


def _spec_resolve(values: list[str]) -> str | None:
    """Reference semantics, reimplemented from the spec (SURVEY.md §2.4 A3):
    after exact dedup, probe precisions 0..5; at the smallest precision
    where exactly ONE value differs from its rounding, that value wins;
    otherwise (strings, ties, all-integers) the group is unresolvable."""
    distinct = sorted(set(values))
    if len(distinct) == 1:
        return distinct[0]
    try:
        nums = [float(v) for v in distinct]
    except ValueError:
        return None
    for precision in range(6):
        survivors = [v for v, n in zip(distinct, nums) if round(n, precision) != n]
        if len(survivors) == 1:
            return survivors[0]
    return None


@st.composite
def groups(draw):
    """1-4 decimal strings with 0-5 fractional digits, occasionally plus a
    non-numeric value."""
    vals = []
    for _ in range(draw(st.integers(1, 4))):
        digits = draw(st.integers(0, 5))
        whole = draw(st.integers(0, 999))
        if digits == 0:
            vals.append(f"{whole}.0")
        else:
            frac = draw(st.integers(0, 10**digits - 1))
            vals.append(f"{whole}.{str(frac).zfill(digits)}")
    if draw(st.integers(0, 9)) == 0:
        vals.append("not-a-number")
    return vals


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(groups(), min_size=1, max_size=8))
@pytest.mark.slow
def test_fuzzy_matches_reference_loop(spark, groups_list):
    rows = [
        (f"g{i}", "cost", v) for i, vals in enumerate(groups_list) for v in vals
    ]
    df = spark.createDataFrame(
        rows, "c_id string, name string, value string"
    ).dropDuplicates()
    result = fuzzy_dedup(df, ["c_id", "name"])
    got = {r["c_id"]: r["value"] for r in result.resolved.collect()}
    errored = {r["c_id"] for r in result.errors.collect()}

    for i, vals in enumerate(groups_list):
        key = f"g{i}"
        expected = _spec_resolve(vals)
        if expected is None:
            assert key in errored and key not in got, (key, vals)
        else:
            assert got.get(key) == expected, (key, vals, got.get(key), expected)
            assert key not in errored


# ---------------------------------------------------------------------------
# G17 sequence packing: two-phase block prefix sum ≡ serial prefix sum
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 40),            # token count (zeros included)
            st.sampled_from(["a", "b", None]),  # stream, incl. NULL
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 7),                     # block size
    st.integers(5, 60),                    # budget
)
@pytest.mark.slow
def test_pack_sequences_matches_serial(spark, rows, block_size, budget):
    from ferc_xbrl_extractor_spark.operators.packing import pack_sequences

    data = [(i, src, n) for i, (n, src) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, n_tokens long")
    got = {
        r["doc_id"]: (r["tok_offset"], r["seq_id"], r["n_seqs"])
        for r in pack_sequences(
            df, by="source", budget=budget, block_size=block_size
        ).collect()
    }
    offs: dict = {}
    for i, src, n in sorted(data, key=lambda r: (r[1] is not None, r[1] or "", r[0])):
        o = offs.get(src, 0)
        offs[src] = o + n
        first = o // budget
        last = (o + max(n, 1) - 1) // budget
        assert got[i] == (o, first, last - first + 1), (i, src, n)
    assert len(got) == len(data)
