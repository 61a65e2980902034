"""Property-based checks for G83 (scd2_intervals) and G80 (rrf_fuse)
against independent Python references.

The SCD2 reference replays the documented semantics (per-key (ts, id)
order, null-safe change detection, lead-closed intervals) with plain
dict loops; the RRF reference sums exact integer micro-contributions
per (query, item) and re-ranks with the same total order. Hypothesis
drives both with random logs / rankings.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferc_xbrl_extractor_spark.operators.analytics import scd2_intervals
from ferc_xbrl_extractor_spark.operators.similarity import (
    RRF_MICRO,
    rrf_fuse,
)

BASE = dt.datetime(2024, 1, 1)
LABELS = ["a", "b", None]


@st.composite
def scd2_case(draw):
    n = draw(st.integers(1, 30))
    # event_id is the unique order tiebreak; ts deliberately collides
    return [
        (
            draw(st.integers(0, 3)),          # key
            draw(st.integers(0, 6)),          # day offset (collisions!)
            i,                                # event_id
            draw(st.sampled_from(LABELS)),    # attr (None = real NULL)
        )
        for i, _ in enumerate(range(n))
    ]


def ref_scd2(rows):
    by_key = {}
    for k, d, i, v in rows:
        by_key.setdefault(k, []).append((d, i, v))
    out = []
    sentinel = object()
    for k, evs in by_key.items():
        evs.sort()
        versions = []
        last = sentinel  # != anything, incl. None (NULL->NULL no change)
        for d, i, v in evs:
            if last is sentinel or v != last:
                versions.append([v, d, None])
                last = v
        for j in range(len(versions) - 1):
            versions[j][2] = versions[j + 1][1]
        for j, (v, frm, to) in enumerate(versions):
            out.append((k, j + 1, v, frm, to, to is None))
    return sorted(out, key=lambda r: (r[0], r[1]))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(scd2_case())
@pytest.mark.slow
def test_scd2_matches_reference(spark, case):
    rows = [
        (k, BASE + dt.timedelta(days=d), i, v) for k, d, i, v in case
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = sorted(
        (
            (
                r["user_id"],
                r["version"],
                r["event_type"],
                (r["valid_from"] - BASE).days,
                None
                if r["valid_to"] is None
                else (r["valid_to"] - BASE).days,
                r["is_current"],
            )
            for r in scd2_intervals(
                df, ["user_id"], ts_col="ts", attr_cols=["event_type"],
                order_cols=["event_id"],
            ).collect()
        ),
        key=lambda r: (r[0], r[1]),
    )
    assert got == ref_scd2(case)
    # intervals chain per key: valid_to == next version's valid_from,
    # exactly one current version per key
    per_key = {}
    for row in got:
        per_key.setdefault(row[0], []).append(row)
    for vs in per_key.values():
        assert sum(1 for v in vs if v[5]) == 1
        for a, b in zip(vs, vs[1:]):
            assert a[4] == b[3]


@st.composite
def rrf_case(draw):
    n_lists = draw(st.integers(1, 3))
    lists = []
    for _ in range(n_lists):
        per_query = {}
        for q in range(draw(st.integers(1, 3))):
            items = draw(
                st.lists(st.integers(0, 9), min_size=1, max_size=6,
                         unique=True)
            )
            per_query[q] = items
        lists.append(per_query)
    k0 = draw(st.sampled_from([1, 10, 60]))
    return lists, k0


def ref_rrf(lists, k0):
    scores, nl = {}, {}
    for per_query in lists:
        for q, items in per_query.items():
            for rank0, item in enumerate(items):
                key = (q, item)
                scores[key] = scores.get(key, 0) + RRF_MICRO // (
                    k0 + rank0 + 1
                )
                nl[key] = nl.get(key, 0) + 1
    out = {}
    by_q = {}
    for (q, item), s in scores.items():
        by_q.setdefault(q, []).append((s, item))
    for q, pairs in by_q.items():
        pairs.sort(key=lambda p: (-p[0], p[1]))
        for rank0, (s, item) in enumerate(pairs):
            out[(q, item)] = (nl[(q, item)], s, rank0 + 1)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rrf_case())
@pytest.mark.slow
def test_rrf_fuse_matches_reference(spark, case):
    lists, k0 = case
    dfs = []
    for per_query in lists:
        rows = [
            (q, item, rank0 + 1)
            for q, items in per_query.items()
            for rank0, item in enumerate(items)
        ]
        dfs.append(
            spark.createDataFrame(
                rows, "query_id long, neighbor_id long, rank long"
            )
        )
    got = {
        (r["query_id"], r["neighbor_id"]): (
            r["n_lists"], r["rrf_micro"], r["fused_rank"]
        )
        for r in rrf_fuse(dfs, k0=k0).collect()
    }
    assert got == ref_rrf(lists, k0)
