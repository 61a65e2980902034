"""Property-based checks for G75 (window_funnel) and G76 (histogram
quantiles) against independent Python references.

The funnel reference replays the documented semantics (longest ordered
prefix, earliest-reach-at-or-after, window off step 1) with plain dict
loops; the histogram reference recomputes bucket counts and the
interpolation formula with floats. Hypothesis drives both with random
event sets / value sets.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferc_xbrl_extractor_spark.operators.analytics import (
    hist_partials,
    hist_quantile,
    hist_rollup,
    window_funnel,
)

STEPS = ["s1", "s2", "s3"]
BASE = dt.datetime(2024, 1, 1)


@st.composite
def funnel_case(draw):
    n = draw(st.integers(1, 25))
    events = [
        (
            draw(st.integers(0, 3)),  # user
            draw(st.integers(0, 50)),  # minute offset
            draw(st.sampled_from(STEPS + ["noise"])),
        )
        for _ in range(n)
    ]
    window = draw(st.sampled_from([None, 10, 25]))
    return events, window


def ref_funnel(events, steps, window_min):
    """Independent replay: per user, earliest step-1; each later step the
    earliest matching event at/after the previous reach (and within the
    window of step 1 when set)."""
    out = {}
    users = {u for u, _, _ in events}
    for u in users:
        ts = sorted((m, t) for uu, m, t in events if uu == u)
        t1 = min((m for m, t in ts if t == steps[0]), default=None)
        if t1 is None:
            continue
        reach = [t1]
        for step in steps[1:]:
            prev = reach[-1]
            cand = [
                m
                for m, t in ts
                if t == step
                and m >= prev
                and (window_min is None or m <= t1 + window_min)
            ]
            if not cand:
                break
            reach.append(min(cand))
        out[u] = (len(reach), reach[0], reach[-1])
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(funnel_case())
@pytest.mark.slow
def test_window_funnel_matches_reference(spark, case):
    events, window = case
    rows = [
        (u, BASE + dt.timedelta(minutes=m), t) for u, m, t in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = window_funnel(
        df,
        STEPS,
        window=(None if window is None else f"{window} minutes"),
    )
    got = {
        r["user_id"]: (
            r["steps_reached"],
            int((r["t_first"] - BASE).total_seconds() // 60),
            int((r["t_last"] - BASE).total_seconds() // 60),
        )
        for r in out.collect()
    }
    assert got == ref_funnel(events, STEPS, window)


@st.composite
def hist_case(draw):
    edges = sorted(
        draw(
            st.lists(
                st.integers(0, 100), min_size=2, max_size=6, unique=True
            )
        )
    )
    vals = draw(
        st.lists(
            st.tuples(
                st.sampled_from(["g1", "g2"]),
                st.sampled_from(["pa", "pb"]),
                st.integers(-10, 110),
            ),
            min_size=1,
            max_size=40,
        )
    )
    qs = draw(
        st.lists(
            st.sampled_from([0.25, 0.5, 0.75, 0.9]),
            min_size=1,
            max_size=2,
            unique=True,
        )
    )
    return [float(e) for e in edges], vals, qs


def ref_hist_quantile(edges, vals, qs):
    """Independent replay of bucket counts + the interpolation formula."""
    out = {}
    for grp in {g for g, _, _ in vals}:
        counts = [0] * (len(edges) - 1)
        for g, _, v in vals:
            if g != grp:
                continue
            b = len(edges) - 2
            for i in range(len(edges) - 2, 0, -1):
                if v < edges[i]:
                    b = i - 1
            counts[b] = counts[b] + 1
        total = sum(counts)
        ests = []
        for q in qs:
            rank = q * total
            cum = 0
            est = None
            for b, n in enumerate(counts):
                if n > 0 and cum < rank <= cum + n:
                    est = edges[b] + (edges[b + 1] - edges[b]) * (
                        rank - cum
                    ) / n
                    break
                cum += n
            ests.append(None if est is None else round(est, 6))
        out[grp] = ests
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(hist_case())
@pytest.mark.slow
def test_hist_quantile_matches_reference_and_rollup(spark, case):
    edges, vals, qs = case
    df = spark.createDataFrame(vals, "grp string, part string, v long")
    parts = hist_partials(df, ["grp", "part"], "v", edges)
    rolled = hist_rollup(parts, ["grp"])
    direct = hist_partials(df, ["grp"], "v", edges)
    assert {
        (r["grp"], r["bucket"], r["n"]) for r in rolled.collect()
    } == {(r["grp"], r["bucket"], r["n"]) for r in direct.collect()}

    names = [f"p{str(q).replace('0.', '')}" for q in qs]
    got = {
        r["grp"]: [r[nm] for nm in names]
        for r in hist_quantile(rolled, ["grp"], edges, qs).collect()
    }
    expect = ref_hist_quantile(edges, vals, qs)
    for grp, exp in expect.items():
        for a, b in zip(got[grp], exp):
            if b is None:
                assert a is None
            else:
                assert a == pytest.approx(b, abs=2e-6)
