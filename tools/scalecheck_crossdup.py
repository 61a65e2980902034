"""Scale evidence for G94 minhash_lsh_join (cross-corpus near-dup join).

The operator's claim: when an INCREMENT joins an existing CORPUS, the
bipartite banded join does only the cross-side work, while the
self-join over corpus ∪ increment wastes its time surfacing (and
verifying, and deduplicating) the corpus×corpus pairs nobody asked
about. This tool measures both on the sf0.1 documents relation with a
derived increment (a sample of the corpus with offset ids and a text
perturbation, so every increment doc is a planted cross near-dup of
its source), at increment ratios 100% and 10%:

  {"record": "scalecheck_crossdup", "tiers": [...]}

Each tier also asserts, IN-RUN, that the bipartite cross-pair set
equals the cross-side subset of the union self-join's output (same
band geometry ⇒ same candidates ⇒ same verified pairs).

Usage: python tools/scalecheck_crossdup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferc_xbrl_extractor_spark.operators import neardup  # noqa: E402
from ferc_xbrl_extractor_spark.session import get_spark  # noqa: E402

OFFSET = 10_000_000


def timed(fn, reps: int = 2) -> float:
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def synth_docs(spark, n: int, fam_dup_pct: int):
    """n synthetic ~30-token docs built in-plan from md5-derived
    tokens. Docs i and i+1 of an even/odd pair share their 30 base
    tokens (a planted near-dup) when (i//2) % 100 < fam_dup_pct —
    controlled within-corpus near-dup density, the work a union
    self-join re-does and the bipartite join skips."""
    fam = F.when(
        F.pmod((F.col("id") / 2).cast("long"), F.lit(100))
        < fam_dup_pct,
        (F.col("id") / 2).cast("long"),
    ).otherwise(F.col("id") + 1_000_000_000)  # unique: no partner
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda j: F.substring(
            F.md5(F.concat(fam.cast("string"), F.lit(":"), j.cast("string"))),
            1,
            6,
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(toks, " "),
            F.lit(" v"),
            F.pmod(F.col("id"), F.lit(2)).cast("string"),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(
        "scalecheck-crossdup",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tiers = []
    for n_corpus in (20_000, 200_000):
        # 30% of corpus docs carry a planted within-corpus near-dup —
        # realistic crawl density, the self-join's pure waste here
        corpus = synth_docs(spark, n_corpus, 30).localCheckpoint(
            eager=True
        )
        # increment = 10% of corpus size, each doc a near-dup of ONE
        # corpus doc (same family tokens, different variant token)
        inc = (
            synth_docs(spark, n_corpus, 100)
            .filter(
                (F.pmod(F.col("doc_id"), F.lit(20)) == 0)
                # partner the docs whose family is UNIQUE in-corpus too
            )
            .select(
                (F.col("doc_id") + OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" inc")).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        n_inc = inc.count()

        bi = lambda: neardup.minhash_lsh_join(  # noqa: E731
            corpus, inc, threshold=0.5
        ).count()
        both = corpus.unionByName(inc)
        un = lambda: neardup.minhash_lsh_pairs(  # noqa: E731
            both, threshold=0.5
        ).count()

        bi_s = timed(bi)
        un_s = timed(un)

        # in-run value check: the bipartite output ≡ the cross-side
        # subset of the union self-join (canonicalized to (corpus, inc))
        cross = {
            (r["id_a"], r["id_b"])
            for r in neardup.minhash_lsh_pairs(both, threshold=0.5)
            .filter(
                (F.col("id_a") < OFFSET) != (F.col("id_b") < OFFSET)
            )
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .collect()
        }
        bip = {
            (r["id_a"], r["id_b"])
            for r in neardup.minhash_lsh_join(
                corpus, inc, threshold=0.5
            ).collect()
        }
        assert bip == cross, (len(bip), len(cross))
        tiers.append(
            {
                "n_corpus": n_corpus,
                "n_increment": n_inc,
                "bipartite_sec": bi_s,
                "union_selfjoin_sec": un_s,
                "cross_pairs": len(bip),
                "speedup": round(un_s / bi_s, 2),
            }
        )
    print(
        json.dumps(
            {
                "record": "scalecheck_crossdup",
                "op": "g94_crossdup",
                "threshold": 0.5,
                "tiers": tiers,
            }
        )
    )


if __name__ == "__main__":
    main()
