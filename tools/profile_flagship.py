"""Quick in-situ profiler for the flagship queries (task: r4 perf recovery).

Times xbrl_fact_pipeline and xbrl_extract_e2e at sf0.1 with the same
warm+min-of-2 methodology bench.py uses, printing per-query numbers only.
Usage: python tools/profile_flagship.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ferc_xbrl_extractor_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:] or ["xbrl_fact_pipeline", "xbrl_extract_e2e"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    for name in names:
        qs[name](spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s")


if __name__ == "__main__":
    main()
