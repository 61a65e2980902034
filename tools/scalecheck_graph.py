"""Hub-skew scale evidence for G65 PageRank (r6 verdict item #1).

The degree computation is a groupBy aggregate joined back, NOT a count
window partitioned by source — a window would serialize a hub page's
entire out-edge list through one task. This tool measures pagerank on
synthetic link graphs where ONE hub source owns ~50% of all edges, at
two scales (10× edges), and prints one JSON line for BASELINE.md:

  {"record": "scalecheck_graph", "tiers": {...}, "hub_share": 0.5}

A skew-safe shape should scale near-linearly in |edges| and show no
straggler cliff between tiers; with the old count-window form the hub
tier's first materialization was bounded by the single task holding the
hub's out-edges.

Usage: python tools/scalecheck_graph.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators import graph  # noqa: E402
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402


def hub_graph(spark, n_edges: int):
    """~50% of edges leave node 0 (the hub); the rest form a ring over
    nodes 1..k so every node exists on both sides."""
    k = n_edges // 2
    hub = spark.range(1, k + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    ring = spark.range(1, k + 1).select(
        F.col("id").alias("src"), (F.col("id") % k + 1).alias("dst")
    )
    return hub.unionByName(ring).repartition(32)


def main() -> None:
    spark = get_spark(
        "scalecheck-graph",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # seeded tier (r8 verdict #4): the G87 personalized form on the same
    # hub graphs, 200-literal seed set — after the teleport fold the
    # rounds are shape-identical to the uniform path (the seed CASE
    # evaluates once per edge at the reused exchange, not per round), so
    # seeded/uniform should sit near 1× and scale at the same slope.
    seeds = list(range(1, 201))
    tiers = {}
    seeded = {}
    for n_edges in (200_000, 2_000_000):
        e = hub_graph(spark, n_edges)
        for label, kw in (("uniform", {}), ("seeded", {"seeds": seeds})):
            graph.pagerank(e, iters=3, **kw).count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                graph.pagerank(e, iters=3, **kw).count()
                best = min(best, time.time() - t0)
            (tiers if label == "uniform" else seeded)[str(n_edges)] = round(
                best, 3
            )
    ratio = round(tiers["2000000"] / tiers["200000"], 2)
    s_ratio = round(seeded["2000000"] / seeded["200000"], 2)
    print(
        json.dumps(
            {
                "record": "scalecheck_graph",
                "op": "g65_pagerank",
                "hub_share": 0.5,
                "iters": 3,
                "tiers_sec": tiers,
                "time_ratio_for_10x_edges": ratio,
                "seeded_tiers_sec": seeded,
                "seeded_time_ratio_for_10x_edges": s_ratio,
                "seeded_over_uniform_at_2m": round(
                    seeded["2000000"] / tiers["2000000"], 2
                ),
                "n_seeds": len(seeds),
            }
        )
    )


if __name__ == "__main__":
    main()
