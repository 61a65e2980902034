"""Suite-wide subtree-duplication audit: for every declared fine query,
count Exchanges and REPEATED parquet scans of the same file in the final
physical plan. A file scanned N>1 times inside one query's plan usually
means a relation with multiple consumers re-executes its lineage per
consumer (guide §2.4) — the disease the r10 optimization round hunts.

    python tools/dup_audit.py [sf_dir] [query ...]

Prints one line per query: exchanges, total scans, max repeats of one
file, and the repeated files. Queries whose CONSTRUCTION executes real
work (streams, on-disk indexes) are skipped like tools/plan_audit.py.
Sorted worst-first by max repeats then exchanges.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {
    "g12_stream_dedup",
    "g12_stream_asof",
    "s8_stream_extract",
    "g23_incremental_dedup",
    "g24_incremental_neardup",
    "s7_jsonl_roundtrip",
    "s7_orc_roundtrip",
    "g30_temperature_mix",
    "g16_curate_e2e",
}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    execute = "--exec" in args
    args = [a for a in args if a != "--exec"]

    import __spark_entry__ as entrymod
    from ferc_xbrl_extractor_spark.session import get_spark

    spark = get_spark(
        "dup_audit", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entrymod.fine_queries()
    names = args or [n for n in qs if n not in SKIP]
    rows = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            if execute:
                # post-execution FINAL adaptive plan: static counts
                # overstate duplication when (Reused)Exchange/AQE stage
                # reuse dedupes identical subtrees at runtime. Must be
                # collect() (the df's OWN queryExecution) — count()
                # spawns a separate execution and leaves this plan
                # un-finalized (isFinalPlan=false, zero ReusedExchange).
                df.collect()
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # audit must cover the rest regardless
            print(f"ERR {name}: {exc}")
            continue
        # In an executed adaptive plan the text carries BOTH the final
        # and the initial plan trees; count tree nodes from the final
        # tree only. The "Location:" details section lists each unique
        # operator id once, so it already excludes ReusedExchange'd
        # subtrees and the initial-plan re-listing shares scan ids.
        tree = txt.split("== Initial Plan ==")[0]
        exch = len(re.findall(r"\bExchange\b", tree))
        reused = tree.count("ReusedExchange")
        locs = re.findall(r"Location: \S+ \[([^\]]*)\]", txt)
        from collections import Counter

        c = Counter(os.path.basename(l.rstrip("/")) for l in locs)
        rep = {f: n for f, n in c.items() if n > 1}
        rows.append(
            (max(rep.values(), default=1), exch, name, sum(c.values()), reused, rep)
        )
    rows.sort(reverse=True)
    for mx, exch, name, scans, reused, rep in rows:
        extra = f"  repeated={rep}" if rep else ""
        print(
            f"{name}: exch={exch} reused={reused} scans={scans} "
            f"max_rescan={mx}{extra}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
