"""Scale decades for the round-10 second wave: G104 label propagation,
G107 multi-benchmark decontamination, G108 KMV sketches, G110 HITS.
One 10x tier pair per op on synthetic in-plan data, correctness asserted
INSIDE the measured run (the house rule: a scale number without an
in-run identity check is a number about nothing), one JSON line for
BASELINE.md:

  {"record": "scalecheck_r10b", "lpa": {...}, "multidecon": {...},
   "kmv": {...}, "hits": {...}}

- LPA: 1M -> 10M edges, nodes in 1000-member groups with 8 random
  INTRA-group edges each and no inter-group edges; asserted (exact,
  structural — labels can only propagate along edges): every node's
  final community id lies inside its own group's id range, node count
  matches; the per-group distinct-label count is reported as the
  convergence measure, not asserted (3 synchronous rounds on a sparse
  graph need not converge — the gate oracle pins the semantics).
- Multi-decon: 20k -> 100k docs, FIVE benchmark slices (doc_id % 31 in
  1..5); measured one-pass multi report vs five sequential G15
  reports; asserted: the (doc, bench) hit relations are IDENTICAL
  (exceptAll both ways empty) in the measured configuration.
- KMV: two strata of 1M -> 10M distinct keys with EXACTLY 50% overlap
  (|A|=|B|=N, inter N/2, union 3N/2), k=256; asserted: est_distinct
  within 30% of N for both strata, est_union within 30% of 1.5N,
  est_inter within 45% of N/2 (ρ carries ~9% σ at k=256, these are
  >3σ bands); the EXACT alternative (count distinct + exact
  intersection join) is timed alongside — the sketch's pitch.
- HITS: the G100 hub graph 1M -> 10M edges, iters=3,
  normalize='rounds' (the unbounded-scale mode); asserted: node 0
  (source of half the edges) holds hub_micro == unit, max auth ==
  unit, all scores inside [0, unit].

Usage: python tools/scalecheck_r10b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators.analytics import (  # noqa: E402
    kmv_distinct_report,
    kmv_intersection_report,
)
from ferc_xbrl_extractor_spark.operators.graph import (  # noqa: E402
    hits_scores,
    label_propagation,
)
from ferc_xbrl_extractor_spark.operators.neardup import (  # noqa: E402
    contamination_multi_report,
    contamination_report,
)
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402

GROUP = 1_000  # LPA group size


def grouped_graph(spark, n_edges: int):
    """8 intra-group edges per node, zero inter-group edges."""
    n_nodes = n_edges // 8
    e = spark.range(n_nodes)
    base = (F.col("id") / GROUP).cast("long") * GROUP
    dsts = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda j: base + F.pmod(F.xxhash64("id", j), F.lit(GROUP)),
    )
    return e.select(
        F.col("id").alias("src"), F.explode(dsts).alias("dst")
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


def decon_docs(spark, n_docs: int):
    """40 pooled md5 sentences per doc, all unique per doc — benchmark
    slices share shingles with their own docs only, so per-bench hits
    are exactly the slice members (plus nothing else)."""
    sent = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.md5(
            F.concat(F.col("id").cast("string"), F.lit("#"), j.cast("string"))
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(sent, " ").alias("text")
    ).repartition(32)


def kmv_keys(spark, n: int):
    """Strata a/b, |a|=|b|=n distinct keys, exactly 50% overlap."""
    return spark.range(2 * n).select(
        F.when(F.col("id") < n, F.lit("a")).otherwise(F.lit("b")).alias("st"),
        F.when(F.col("id") < n, F.col("id"))
        .otherwise(F.col("id") - n + n // 2)
        .alias("key"),
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
        "scalecheck-r10b",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out: dict = {"record": "scalecheck_r10b"}

    # ---- G104 label propagation ----
    lpa: dict = {}
    for n in (1_000_000, 10_000_000):
        g = grouped_graph(spark, n)
        lpa[str(n)] = timed(lambda: label_propagation(g, rounds=3).count())
        res = label_propagation(g, rounds=3)
        grp = (F.col("node") / GROUP).cast("long")
        cgrp = (F.col("community") / GROUP).cast("long")
        chk = res.select(
            F.count(F.lit(1)).alias("n"),
            F.sum((grp != cgrp).cast("long")).alias("crossed"),
            F.count_distinct("community").alias("n_labels"),
        ).collect()[0]
        assert chk["n"] == n // 8, chk["n"]
        assert chk["crossed"] == 0, chk["crossed"]  # labels never cross groups
        lpa["labels_per_group_" + str(n)] = round(
            chk["n_labels"] / (chk["n"] / GROUP), 2
        )
    lpa["ratio_10x"] = round(lpa["10000000"] / lpa["1000000"], 2)
    lpa["identity"] = "zero cross-group labels at both tiers (structural exact)"
    out["lpa"] = lpa

    # ---- G107 multi-benchmark decontamination ----
    md: dict = {}
    n_bench = 5
    for n in (20_000, 100_000):
        d = decon_docs(spark, n)
        benches = {
            f"b{i}": d.filter(F.col("doc_id") % 31 == i)
            for i in range(1, n_bench + 1)
        }
        kw = dict(n=3, min_overlap=5)
        md["multi_" + str(n)] = timed(
            lambda: contamination_multi_report(d, benches, **kw).count()
        )

        def _seq():
            tot = 0
            for name, b in benches.items():
                tot += contamination_report(d, b, **kw).count()
            return tot

        md["sequential_" + str(n)] = timed(_seq)
        # identity inside the measured configuration
        multi = contamination_multi_report(d, benches, **kw)
        seq = None
        for name, b in benches.items():
            s = contamination_report(d, b, **kw).select(
                "doc_id", F.lit(name).alias("bench"), "n_hits"
            )
            seq = s if seq is None else seq.unionByName(s)
        assert multi.exceptAll(seq).count() == 0
        assert seq.exceptAll(multi).count() == 0
    md["speedup_100k"] = round(md["sequential_100000"] / md["multi_100000"], 2)
    md["n_benchmarks"] = n_bench
    md["identity"] = "multi report == union of per-bench G15 reports, both tiers"
    out["multidecon"] = md

    # ---- G108 KMV ----
    kmv: dict = {}
    K = 256
    for n in (1_000_000, 10_000_000):
        d = kmv_keys(spark, n)
        kmv["sketch_" + str(n)] = timed(
            lambda: kmv_intersection_report(d, "key", "st", k=K).count()
        )

        def _exact():
            a = d.filter(F.col("st") == "a").select("key").distinct()
            b = d.filter(F.col("st") == "b").select("key").distinct()
            return a.count(), b.count(), a.intersect(b).count()

        kmv["exact_" + str(n)] = timed(lambda: _exact())
        row = kmv_intersection_report(d, "key", "st", k=K).collect()[0]
        dd = {
            r["stratum"]: r["est_distinct"]
            for r in kmv_distinct_report(d, "key", "st", k=K).collect()
        }
        for s in ("a", "b"):
            assert abs(dd[s] - n) / n < 0.30, (s, dd[s], n)
        assert abs(row["est_union"] - 1.5 * n) / (1.5 * n) < 0.30, row
        assert abs(row["est_inter"] - 0.5 * n) / (0.5 * n) < 0.45, row
        kmv["est_inter_rel_err_" + str(n)] = round(
            abs(row["est_inter"] - 0.5 * n) / (0.5 * n), 3
        )
    kmv["ratio_10x_sketch"] = round(
        kmv["sketch_10000000"] / kmv["sketch_1000000"], 2
    )
    kmv["sketch_vs_exact_10m"] = round(
        kmv["exact_10000000"] / kmv["sketch_10000000"], 2
    )
    kmv["k"] = K
    kmv["identity"] = "est_distinct/union within 30%, est_inter within 45% (>3 sigma bands) at both tiers"
    out["kmv"] = kmv

    # ---- G110 HITS (rounds mode) ----
    ht: dict = {}
    for n in (1_000_000, 10_000_000):
        g = hub_graph(spark, n)
        ht[str(n)] = timed(
            lambda: hits_scores(g, iters=3, normalize="rounds").count()
        )
        res = hits_scores(g, iters=3, normalize="rounds")
        chk = res.select(
            F.max(F.when(F.col("node") == 0, F.col("hub_micro"))).alias("hub0"),
            F.max("auth_micro").alias("mxa"),
            F.max("hub_micro").alias("mxh"),
            F.min("hub_micro").alias("mnh"),
            F.min("auth_micro").alias("mna"),
        ).collect()[0]
        assert chk["hub0"] == 1_000_000, chk["hub0"]
        assert chk["mxa"] == 1_000_000 and chk["mxh"] == 1_000_000
        assert chk["mnh"] >= 0 and chk["mna"] >= 0
    ht["ratio_10x"] = round(ht["10000000"] / ht["1000000"], 2)
    ht["identity"] = "hub node holds hub==unit, scores in [0, unit], both tiers"
    out["hits"] = ht

    print(json.dumps(out))


if __name__ == "__main__":
    main()
