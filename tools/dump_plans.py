"""Dump `.explain("formatted")` for named fine queries to plans/<dir>/.

    python tools/dump_plans.py <outdir-under-plans> <tag> query [query ...]

Writes plans/<outdir>/<query>_<tag>.txt for each query. Construction-time
eager actions (budget aggs, quantile probes) run as part of building the
DataFrame; the dumped plan is the final returned DataFrame's plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from ferc_xbrl_extractor_spark.session import get_spark

    spark = get_spark("dump_plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.fine_queries()
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(base, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(base, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
