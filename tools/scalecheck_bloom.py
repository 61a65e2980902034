"""In-regime scale evidence for G86 bloom_join (r8 verdict item #2).

The gate row (g86_bloom_join) deliberately prices the operator OUTSIDE
its regime — a 15k-key dim that AQE broadcasts anyway, where the
prefilter is pure overhead. The operator's claimed regime is a dim side
past the broadcast hash-relation ceiling (default 10 MB ≈ 10⁵-10⁶ keys)
joining a selective fact table whose ROWS ARE WIDE enough that the
exchange is what hurts. This tool measures that regime directly:

  dim     = K filtered keys (tiers 10⁶ and 10⁷ — both past the ceiling)
  fact    = 5K rows, 1% matching a dim key (sel=0.01; non-matching keys
            live in a disjoint range), payload of 56 or 224 bytes
  measure = aggregate over the PAYLOAD of the join result. A bare
            count() lets Catalyst prune the payload out of the scan and
            the exchange entirely, silently re-pricing the fact table
            as keys-only — the first cut of this tool did exactly that
            and concluded the prefilter "never pays" locally. Summing
            length(payload) forces the real fact row through the
            shuffle on both paths.

Reported per tier: plain shuffled-join time, blocked bloom_join time
(the operator default — JVM-only build + broadcast word-table probe),
classic UDF-mode time, and the exchange population with/without the
prefilter (the shuffled-bytes proxy at fixed row width). Output, one
JSON line for BASELINE.md / SCALECHECK_BLOOM_r09.json.

Usage: python tools/scalecheck_bloom.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators import bloom  # noqa: E402
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402

SEL_MOD = 100  # 1 fact row in 100 matches the dim


def dim_of(spark, k: int):
    return spark.range(k).select(F.col("id").alias("key"))


def fact_of(spark, k: int, pad: int):
    n = 5 * k
    return spark.range(n).select(
        F.when(F.col("id") % SEL_MOD == 0, (F.col("id") / SEL_MOD).cast("long") % k)
        .otherwise(F.col("id") + k)
        .alias("key"),
        F.concat(F.lit("p" * pad), F.col("id").cast("string")).alias("payload"),
    )


def force(df):
    """Aggregate over the payload so it cannot be pruned off the
    exchange (see module docstring)."""
    return df.agg(F.sum(F.length("payload"))).collect()


def timed(fn, reps: int = 2) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(
        "scalecheck-bloom",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tiers = []
    for k in (1_000_000, 10_000_000):
        for pad in (56, 224):
            dim = dim_of(spark, k).localCheckpoint(eager=True)
            fact = fact_of(spark, k, pad)
            n_fact = 5 * k

            plain_s = timed(lambda: force(fact.join(dim, "key")))
            blocked_s = timed(
                lambda: force(bloom.bloom_join(fact, dim, "key", n_keys=k))
            )
            udf_s = timed(
                lambda: force(
                    bloom.bloom_join(fact, dim, "key", n_keys=k, mode="udf")
                )
            )
            words, w, kk = bloom.blocked_bloom_words(dim, "key", n_keys=k)
            wd, mask = bloom._blocked_word_mask("key", w, kk)
            survivors = int(
                fact.withColumn("__bw", wd)
                .withColumn("__bm", mask)
                .join(F.broadcast(words), "__bw")
                .filter(
                    F.col("__bits").bitwiseAND(F.col("__bm")) == F.col("__bm")
                )
                .count()
            )
            # sanity: identical result to the plain join
            assert (
                bloom.bloom_join(fact, dim, "key", n_keys=k).count()
                == fact.join(dim, "key").count()
            )
            tiers.append(
                {
                    "n_dim": k,
                    "n_fact": n_fact,
                    "payload_bytes": pad,
                    "plain_join_sec": plain_s,
                    "blocked_join_sec": blocked_s,
                    "udf_join_sec": udf_s,
                    "rows_into_exchange_plain": n_fact,
                    "rows_into_exchange_bloom": survivors,
                    "exchange_cut": round(1 - survivors / n_fact, 4),
                    "speedup_blocked": round(plain_s / blocked_s, 2),
                }
            )
    print(
        json.dumps(
            {
                "record": "scalecheck_bloom",
                "op": "g86_bloom_join",
                "selectivity": 1 / SEL_MOD,
                "fpp": 0.01,
                "tiers": tiers,
            }
        )
    )


if __name__ == "__main__":
    main()
