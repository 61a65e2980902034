"""Per-query decomposition profiler: splits a fine query's wall-clock into
(a) DataFrame CONSTRUCTION (the q_ function call — includes any eager
driver actions it performs: approxQuantile probes, budget aggs, collected
centroids), (b) PLANNING (queryExecution.executedPlan force), and
(c) EXECUTION (count(), same action the bench times), plus the Spark job
count per phase. Usage:

    python tools/qprofile.py [sf_dir] query [query ...]

Each query is warmed once end-to-end first (JIT/codegen is a JVM property,
not plan cost — bench methodology), then each phase is timed on a fresh
build. Job counts come from the status tracker's job-id high-water mark.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if not args:
        print(__doc__)
        return 2

    import __spark_entry__ as entrymod
    from ferc_xbrl_extractor_spark.session import get_spark

    spark = get_spark("qprofile", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.fine_queries()
    tracker = spark.sparkContext.statusTracker()

    def job_hwm() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids, default=-1)

    for name in args:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm
        best = None
        for _ in range(2):
            j0 = job_hwm()
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            j1 = job_hwm()
            _ = df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            j2 = job_hwm()
            df.count()
            t3 = time.time()
            j3 = job_hwm()
            rec = (t1 - t0, t2 - t1, t3 - t2, t3 - t0, j1 - j0, j3 - j2)
            if best is None or rec[3] < best[3]:
                best = rec
        c, p, e, tot, jc, je = best
        print(
            f"{name}: total={tot:.2f}s construct={c:.2f}s (jobs={jc}) "
            f"plan={p:.2f}s exec={e:.2f}s (jobs={je})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
