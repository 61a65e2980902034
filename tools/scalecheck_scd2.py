"""Scale evidence for G83 (analytics.scd2_intervals): the change-log →
validity-interval build at 1M and 10M events — two decades past the
100k-row gate fixture (whose bench slope, 4.3×/decade at sf0.01→sf0.1,
is mostly the job floor amortizing; this measures the asymptote).

Log: n events over n/100 keys (~100 events each, the SCD2 regime —
dimension keys with long histories), 8 distinct states, ~30% of
consecutive rows repeating the previous state so the duplicate-merge
path does real work. The measured runs assert the exact version count
(independently computed with a lag-based change count) — correctness
inside the measurement, the scalecheck_hamming pattern.

Writes nothing to the repo. Usage:
    python tools/scalecheck_scd2.py  → one JSON line for the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators.analytics import (  # noqa: E402
    scd2_intervals,
)
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402


def build(spark, n: int):
    n_keys = n // 100
    return spark.range(n).select(
        (F.col("id") % n_keys).alias("key"),
        # distinct ts per (key, id): seconds since epoch by visit index
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / n_keys).cast("long")
        ).alias("ts"),
        F.col("id").alias("event_id"),
        # ~30% repeats: the state only advances when the hash says so
        F.concat(
            F.lit("s"),
            F.pmod(
                F.xxhash64(
                    "key",
                    F.when(
                        F.pmod(F.xxhash64("id", F.lit("r")), F.lit(10)) < 3,
                        (F.col("id") / n_keys).cast("long") - 1,
                    ).otherwise((F.col("id") / n_keys).cast("long")),
                ),
                F.lit(8),
            ).cast("string"),
        ).alias("state"),
    )


def timed(spark, n: int) -> dict:
    ev = build(spark, n)
    run = lambda: scd2_intervals(  # noqa: E731
        ev, ["key"], ts_col="ts", attr_cols=["state"],
        order_cols=["event_id"],
    )
    # independent expected-version count: lag-based change flags
    w = Window.partitionBy("key").orderBy("ts", "event_id")
    prev = F.lag("state").over(w)
    expected = (
        ev.select(
            (prev.isNull() | ~F.col("state").eqNullSafe(prev))
            .cast("long")
            .alias("c")
        )
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    got = run().count()
    assert got == expected, (got, expected)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run().count()
        best = min(best, time.time() - t0)
    return {
        "events": n,
        "keys": n // 100,
        "versions": int(got),
        "build_s": round(best, 3),
    }


def main() -> None:
    spark = get_spark(
        "scalecheck-scd2",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    t1 = timed(spark, 1_000_000)
    t10 = timed(spark, 10_000_000)
    print(
        json.dumps(
            {
                "record": "scalecheck_scd2",
                "op": "scd2_intervals (G83)",
                "tiers": {"1m": t1, "10m": t10},
                "time_ratio_for_10x_events": round(
                    t10["build_s"] / t1["build_s"], 2
                ),
                "note": "one hash exchange + one sort shared by both "
                "window passes (plan-pinned in tests/test_plans.py); "
                "version counts independently recomputed with lag-based "
                "change flags and asserted equal inside both measured "
                "runs. The gate-scale bench slope (4.3x/decade at "
                "sf0.01->sf0.1) is the job floor amortizing; this is "
                "the asymptotic slope.",
            }
        )
    )


if __name__ == "__main__":
    main()
