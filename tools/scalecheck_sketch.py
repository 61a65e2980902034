"""Scale evidence for G72 (count-min sketch) and G73 (water-filling):

- G72: build the sketch over synthesized high-cardinality key streams
  (xxhash64-derived keys, ~|rows|/2 distinct — the URL/n-gram/user-id
  shape CMS exists for) at 10M and 100M rows. The sketch relation is
  capped at depth x width cells at BOTH tiers — the claim under test is
  that build time scales with the SCAN (map-side partials bounded at
  depth x width per task), not with key cardinality, while the exact
  groupBy must shuffle one row PER DISTINCT KEY. Records the exact
  groupBy time beside the sketch time at both tiers.

- G73: allocate one budget across synthesized domain relations of 1e5
  and 1e6 rows (the |domains| axis the block prefix sums exist for).
  Asserts the fill invariant (sum allocated == min(budget, supply),
  floor leftovers only) inside the measured run at both tiers.

Methodology: every measured action is run once to warm (shuffle
machinery, codegen) and timed min-of-2 after, matching bench.py.
Writes nothing to the repo. Usage:
    python tools/scalecheck_sketch.py  → one JSON line for the record.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators.analytics import (  # noqa: E402
    cms_build,
)
from ferc_xbrl_extractor_spark.operators.sampling import (  # noqa: E402
    mixture_allocation,
)
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402


def _timed(action) -> float:
    action()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        action()
        best = min(best, time.time() - t0)
    return best


def time_cms(spark, n_rows: int) -> dict:
    # ~n_rows/2 distinct keys, zipf-free worst case for an exact groupBy
    keys = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), F.lit(n_rows // 2)).alias("k")
    )
    cells = cms_build(keys, "k", depth=4, width=4096).count()
    assert cells <= 4 * 4096, cells
    cms_s = _timed(lambda: cms_build(keys, "k", depth=4, width=4096).count())
    n_keys = keys.groupBy("k").count().count()
    exact_s = _timed(lambda: keys.groupBy("k").count().count())
    return {
        "rows": n_rows,
        "distinct_keys": n_keys,
        "cms_cells": cells,
        "cms_build_s": round(cms_s, 3),
        "exact_groupby_s": round(exact_s, 3),
    }


def time_alloc(spark, n_domains: int, budget: int) -> dict:
    doms = spark.range(n_domains).select(
        F.concat(F.lit("d"), F.col("id")).alias("domain"),
        (F.pmod(F.xxhash64("id"), F.lit(50_000)) + 1).alias("avail_tokens"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(9)) + 1).alias("weight"),
    )
    supply = doms.agg(F.sum("avail_tokens")).collect()[0][0]
    target = min(budget, supply)

    def run():
        got = (
            mixture_allocation(doms, budget, num_blocks=64)
            .agg(
                F.sum("allocated").alias("alloc"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("saturated"), 1).otherwise(0)).alias(
                    "n_sat"
                ),
            )
            .collect()[0]
        )
        # fill invariant: floor leftovers only (< 1 token per unsat row)
        assert got["n"] == n_domains
        assert (
            target - (n_domains - got["n_sat"]) <= got["alloc"] <= target
        ), got
        return got

    got = run()
    dt = _timed(run)
    return {
        "domains": n_domains,
        "supply": int(supply),
        "allocated": int(got["alloc"]),
        "saturated": int(got["n_sat"]),
        "alloc_s": round(dt, 3),
    }


def main() -> None:
    spark = get_spark(
        "scalecheck-sketch",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    cms_1x = time_cms(spark, 10_000_000)
    cms_10x = time_cms(spark, 100_000_000)

    alloc_1e5 = time_alloc(spark, 100_000, budget=1_000_000_000)
    alloc_1e6 = time_alloc(spark, 1_000_000, budget=10_000_000_000)

    print(
        json.dumps(
            {
                "record": "scalecheck_sketch",
                "cms": {"1x": cms_1x, "10x": cms_10x},
                "cms_time_ratio_for_10x_rows": round(
                    cms_10x["cms_build_s"] / cms_1x["cms_build_s"], 2
                ),
                "alloc": {"1e5": alloc_1e5, "1e6": alloc_1e6},
                "alloc_time_ratio_for_10x_domains": round(
                    alloc_1e6["alloc_s"] / alloc_1e5["alloc_s"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
