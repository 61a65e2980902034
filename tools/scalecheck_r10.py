"""Scale decades for the round-10 operators: G98 Bradley-Terry, G100
bounded BFS, G101 winnowing. One 10x tier pair per op on synthetic
in-plan data, correctness asserted INSIDE the measured run (the house
rule: a scale number without an in-run identity check is a number about
nothing), one JSON line for BASELINE.md:

  {"record": "scalecheck_r10", "bt": {...}, "bfs": {...}, "winnow": {...}}

- BT: 1M -> 10M comparisons over 1,000 players with planted strength
  (the stronger index wins 65%, ties at ~3.4%); asserted: the
  top-decile players' mean BT score exceeds the bottom decile's by
  >= 2x (the planted ordering is recovered), every score inside the
  [1, unit^2] clamp. Pair relation ~ P^2/2 rows, so the tiers also
  exercise the |pairs|-keyed joins at 10x the per-pair counts.
- BFS: 1M -> 10M edges, hub+ring graph (the G65 skew fixture), 50
  seeds, 3 hops; asserted: seeds at hop 0, max hop <= 3, reached
  count non-decreasing in the edge count.
- Winnow: 20k -> 200k docs of 40 pooled 32-char sentences where each
  group of 10 plants exactly one near-dup pair sharing all 40
  sentences; asserted: the pair set is EXACTLY the planted one (count
  == n_docs/10 and every pair is (10g+8, 10g+9) with n_shared well
  past min_shared).

Usage: python tools/scalecheck_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators.graph import bfs_hops  # noqa: E402
from ferc_xbrl_extractor_spark.operators.labels import bt_scores  # noqa: E402
from ferc_xbrl_extractor_spark.operators.neardup import (  # noqa: E402
    winnow_overlap_pairs,
)
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402

P = 1_000  # BT players


def comparisons(spark, n: int):
    """n synthetic comparisons over P players, strength = player index:
    the larger index wins 65% of decisive comparisons; ~1/29 are ties."""
    base = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(P)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(P)).alias("b"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100)) < 65).alias("up"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(29)) == 0).alias("tie"),
    ).filter(F.col("a") != F.col("b"))
    return base.select(
        F.when(F.col("up"), F.greatest("a", "b"))
        .otherwise(F.least("a", "b"))
        .alias("winner"),
        F.when(F.col("up"), F.least("a", "b"))
        .otherwise(F.greatest("a", "b"))
        .alias("loser"),
        "tie",
    ).repartition(32)


def hub_graph(spark, n_edges: int):
    k = n_edges // 2
    hub = spark.range(1, k + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    ring = spark.range(1, k + 1).select(
        F.col("id").alias("src"), (F.col("id") % k + 1).alias("dst")
    )
    return hub.unionByName(ring).repartition(32)


def docs(spark, n_docs: int):
    """40 pooled sentences per doc; ids 10g+8 and 10g+9 share ALL 40
    (sentence seed keyed by the group), everyone else is unique."""
    sent = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.md5(
            F.when(
                F.col("id") % 10 >= 8,
                F.concat(
                    (F.col("id") / 10).cast("long").cast("string"),
                    F.lit("_"),
                    j.cast("string"),
                ),
            ).otherwise(
                F.concat(F.col("id").cast("string"), F.lit("#"), j.cast("string"))
            )
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(sent, " ").alias("text"),
    ).repartition(32)


def timed(fn) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(
        "scalecheck-r10",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out: dict = {"record": "scalecheck_r10"}

    # ---- G98 Bradley-Terry ----
    bt: dict = {}
    for n in (1_000_000, 10_000_000):
        c = comparisons(spark, n)
        bt[str(n)] = timed(lambda: bt_scores(c, tie_col="tie", iters=3).count())
    # identity inside the measured configuration (10M tier)
    rows = bt_scores(comparisons(spark, 10_000_000), tie_col="tie", iters=3)
    agg = rows.select(
        F.avg(F.when(F.col("player") >= P - P // 10, F.col("bt_micro"))).alias("top"),
        F.avg(F.when(F.col("player") < P // 10, F.col("bt_micro"))).alias("bot"),
        F.min("bt_micro").alias("lo"),
        F.max("bt_micro").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["n"] == P, agg["n"]
    assert agg["top"] >= 2 * agg["bot"], (agg["top"], agg["bot"])
    assert 1 <= agg["lo"] and agg["hi"] <= 1_000_000 ** 2
    bt["ratio_10x"] = round(bt["10000000"] / bt["1000000"], 2)
    bt["players"] = P
    bt["ordering_recovered"] = {
        "top_decile_mean_micro": int(agg["top"]),
        "bottom_decile_mean_micro": int(agg["bot"]),
    }
    out["bt"] = bt

    # ---- G100 BFS ----
    # the hub IS a seed: hop 1 reaches n_edges/2 nodes, so the distance
    # relation at tier 2 carries ~5M rows into rounds 2-3 — the frontier
    # stress, not just the edge-scan floor
    bfs: dict = {}
    seeds = [0] + list(range(1, 50))
    reached_prev = 0
    for n in (1_000_000, 10_000_000):
        g = hub_graph(spark, n)
        bfs[str(n)] = timed(lambda: bfs_hops(g, seeds=seeds, max_hops=3).count())
        r = bfs_hops(g, seeds=seeds, max_hops=3)
        chk = r.select(
            F.max("hops").alias("mx"),
            F.sum(F.when(F.col("node").isin(seeds) & (F.col("hops") != 0), 1)
                  .otherwise(0)).alias("bad_seeds"),
            F.count(F.when(F.col("hops").isNotNull(), 1)).alias("reached"),
        ).collect()[0]
        assert chk["mx"] <= 3 and chk["bad_seeds"] == 0, dict(chk.asDict())
        assert chk["reached"] >= reached_prev
        reached_prev = chk["reached"]
        bfs["reached_" + str(n)] = int(chk["reached"])
    bfs["ratio_10x"] = round(bfs["10000000"] / bfs["1000000"], 2)
    bfs["seeds"] = len(seeds)
    out["bfs"] = bfs

    # ---- G101 winnowing ----
    wn: dict = {}
    kw = dict(k=8, window=10, min_shared=5, max_doc_freq=50)
    for n in (20_000, 200_000):
        d = docs(spark, n)
        wn[str(n)] = timed(lambda: winnow_overlap_pairs(d, **kw).count())
        pairs = winnow_overlap_pairs(d, **kw)
        chk = pairs.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("id_a") % 10 == 8)
                    & (F.col("id_b") == F.col("id_a") + 1),
                    1,
                ).otherwise(0)
            ).alias("planted"),
            F.min("n_shared").alias("min_sh"),
        ).collect()[0]
        # EXACTLY the planted pair set: one (10g+8, 10g+9) pair per group
        assert chk["n"] == n // 10, (n, chk["n"])
        assert chk["planted"] == n // 10, chk["planted"]
        assert chk["min_sh"] >= 30, chk["min_sh"]  # 40 shared sentences
    wn["ratio_10x"] = round(wn["200000"] / wn["20000"], 2)
    wn["pair_set"] = "exactly the planted near-dup pairs at both tiers"
    out["winnow"] = wn

    print(json.dumps(out))


if __name__ == "__main__":
    main()
