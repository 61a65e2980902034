"""Scale evidence for G75 (window_funnel): the chained per-step
min-reach joins over synthesized event relations at 1M and 10M events
(one and two decades past the 100k-row sf0.1 gate fixture).

Events are xxhash64-derived: ~n/100 users × ~100 events each, types
drawn uniformly from the three funnel steps plus noise, timestamps
spread over 30 days. The measured run asserts the output is one row per
user that has a step-1 event and that reach counts are within [1, 3] —
correctness inside the measured action, the scalecheck_chain pattern.

Writes nothing to the repo. Usage:
    python tools/scalecheck_funnel.py  → one JSON line for the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators.analytics import (  # noqa: E402
    window_funnel,
)
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402

STEPS = ["signup", "click", "purchase"]


def build(spark, n: int):
    return spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(n // 100)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.xxhash64(F.col("id") + 1), F.lit(30 * 86_400))
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(s) for s in STEPS + ["noise"]]),
            (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(4)) + 1).cast("int"),
        ).alias("event_type"),
    )


def timed(spark, n: int) -> dict:
    ev = build(spark, n)
    n_s1_users = (
        ev.filter(F.col("event_type") == STEPS[0])
        .select("user_id")
        .distinct()
        .count()
    )

    def run():
        out = window_funnel(ev, STEPS, window="7 days")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("steps_reached").alias("lo"),
            F.max("steps_reached").alias("hi"),
            F.sum(
                F.when(F.col("steps_reached") == 3, 1).otherwise(0)
            ).alias("full"),
        ).collect()[0]
        assert agg["n"] == n_s1_users, (agg["n"], n_s1_users)
        assert 1 <= agg["lo"] and agg["hi"] <= 3
        return agg

    agg = run()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return {
        "events": n,
        "funnel_users": n_s1_users,
        "completed_all_steps": int(agg["full"]),
        "funnel_s": round(best, 3),
    }


def main() -> None:
    spark = get_spark(
        "scalecheck-funnel",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    t1 = timed(spark, 1_000_000)
    t10 = timed(spark, 10_000_000)
    print(
        json.dumps(
            {
                "record": "scalecheck_funnel",
                "op": "window_funnel",
                "tiers": {"1m": t1, "10m": t10},
                "time_ratio_for_10x_events": round(
                    t10["funnel_s"] / t1["funnel_s"], 2
                ),
                "note": "three chained pushdown-filtered min aggregates "
                "joined on the user key (co-partitioned after the first "
                "exchange); output row count == distinct step-1 users "
                "asserted inside the measured run at both tiers.",
            }
        )
    )


if __name__ == "__main__":
    main()
