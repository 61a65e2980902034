"""Same-work single-node baselines for the headline queries whose *oracle*
SQL is an algebraic projection (useless for perf comparison).

For each query this runs a hand-written counterpart that performs the SAME
work the Spark plan performs, on the engine the work is most honestly
comparable on:

- ``xbrl_fact_pipeline`` / ``xbrl_fuzzy_dedup`` — DuckDB SQL doing the full
  unpivot -> dup-inject -> dims-filter -> exact dedup -> precision resolve
  -> pivot pipeline (not the simplified oracle projection).
- ``xbrl_shredder_roundtrip`` — the reference's own technology for this op
  is a single Python process running lxml/ElementTree
  (/root/reference/src/ferc_xbrl_extractor/instance.py); we time the SAME
  pandas shred kernel Spark runs inside mapInPandas, single-threaded over
  the same XML bytes, which is exactly the reference's execution model.

Usage:  python tools/samework.py [sf_dir]
Prints one JSON line {"samework": {query: sec, ...}, "sf_dir": ...} for
maintaining BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import _CID_SQL, PUB_TS, TABLES  # noqa: E402

# nd probe, mirroring operators/dedup.py::_ndigits (max_precision=6).
_ND_SQL = (
    "CASE "
    + " ".join(f"WHEN round(num, {p}) = num THEN {p}" for p in range(7))
    + " ELSE 7 END"
)

# The flagship's real work: 4 facts per lineitem row (quantity injected
# twice), junk-dims rows dropped, DISTINCT exact dedup, per-group precision
# stats + most-precise winner, pivot long->wide with casts. Matches
# construct_table's operator sequence on _lineitem_facts + dup injection.
FACT_PIPELINE_SAMEWORK = f"""
WITH facts AS (
    SELECT 'filing-' || l_returnflag AS filing_name,
           {_CID_SQL} AS c_id,
           CAST(l_suppkey AS VARCHAR) AS entity_id,
           '1995-01-01' AS start_date,
           strftime(l_shipdate, '%Y-%m-%d') AS end_date,
           CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'total' END
               AS flag_axis,
           v.name AS name, v.value AS value
    FROM lineitem,
         LATERAL (VALUES ('quantity', CAST(l_quantity AS VARCHAR)),
                         ('quantity', CAST(l_quantity AS VARCHAR)),
                         ('price', CAST(l_extendedprice AS VARCHAR)),
                         ('discount', CAST(l_discount AS VARCHAR))) v(name, value)
    WHERE l_linenumber <> 7
),
deduped AS (SELECT DISTINCT * FROM facts),
staged AS (
    SELECT *, TRY_CAST(value AS DOUBLE) AS num
    FROM deduped
),
nd AS (SELECT *, {_ND_SQL} AS ndig FROM staged),
resolved AS (
    SELECT filing_name, c_id, entity_id, start_date, end_date, flag_axis,
           name,
           min(value) AS vmin, max(value) AS vmax,
           bool_and(num IS NOT NULL) AS all_num,
           max(ndig) AS max_nd,
           count(DISTINCT CASE WHEN ndig = 7 THEN NULL ELSE ndig END) AS nbuckets,
           max_by(value, ndig * 1e12 + coalesce(num, 0)) AS value_win
    FROM nd
    GROUP BY 1, 2, 3, 4, 5, 6, 7
),
pivoted AS (
    SELECT filing_name, c_id, entity_id, start_date, end_date, flag_axis,
           TIMESTAMP '{PUB_TS}' AS publication_time,
           CAST(max(CASE WHEN name = 'quantity' THEN value_win END) AS DOUBLE)
               AS quantity,
           CAST(max(CASE WHEN name = 'price' THEN value_win END) AS DOUBLE)
               AS price,
           CAST(max(CASE WHEN name = 'discount' THEN value_win END) AS DOUBLE)
               AS discount
    FROM resolved
    WHERE vmin = vmax OR (all_num AND max_nd < 7)
    GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT count(*),
       count(quantity) + count(price) + count(discount)
FROM pivoted
"""

# xbrl_fuzzy_dedup's real work: 3 conflicting-precision values per key
# (x, x+0.5, x+0.25), parse + nd probes + per-bucket distinctness + winner.
FUZZY_SAMEWORK = f"""
WITH fixture AS (
    SELECT 'f1' AS filing_name, {_CID_SQL} AS c_id,
           v.name AS name, v.value AS value
    FROM lineitem,
         LATERAL (VALUES ('qty', CAST(l_quantity AS VARCHAR)),
                         ('qty', CAST(l_quantity + 0.5 AS VARCHAR)),
                         ('qty', CAST(l_quantity + 0.25 AS VARCHAR))) v(name, value)
),
staged AS (SELECT *, TRY_CAST(value AS DOUBLE) AS num FROM fixture),
nd AS (SELECT *, {_ND_SQL} AS ndig FROM staged),
stats AS (
    SELECT filing_name, c_id, name,
           min(value) AS vmin, max(value) AS vmax,
           bool_and(num IS NOT NULL) AS all_num,
           {" ".join(
               f"min(CASE WHEN ndig = {p} THEN value END) AS vmin_{p},"
               f"max(CASE WHEN ndig = {p} THEN value END) AS vmax_{p},"
               for p in range(8)
           )}
           max_by(value, ndig * 1e12 + coalesce(num, 0)) AS value_win
    FROM nd GROUP BY 1, 2, 3
),
arith AS (
    SELECT *,
           {"".join(
               f"CASE WHEN vmin_{p} IS NOT NULL THEN {p} ELSE "
               for p in range(7, 0, -1)
           )} 0 {"END " * 7} AS max_nd
    FROM stats
)
SELECT c_id, name, CAST(value_win AS DOUBLE) AS value
FROM arith
WHERE vmin = vmax
   OR (all_num
       AND (CASE max_nd
            {" ".join(
                f"WHEN {p} THEN vmin_{p} = vmax_{p}" for p in range(8)
            )}
            END)
       AND max_nd <= 6)
"""


def _time_duckdb(con: duckdb.DuckDBPyConnection, sql: str) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        con.sql(f"SELECT count(*) FROM ({sql})").fetchall()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _time_shredder_single_process(sf_dir: str) -> float:
    """Single-process pandas shred of the same XML bytes the Spark query
    pushes through mapInPandas — the reference's own execution model
    (lxml in one Python process per batch)."""
    import pandas as pd
    from pyspark.sql import SparkSession

    from __spark_entry__ import _synthetic_filing_xml
    from ferc_xbrl_extractor_spark.sources.shredder import _shred_batches

    spark = SparkSession.getActiveSession()
    owns = spark is None
    if owns:
        from ferc_xbrl_extractor_spark.session import get_spark

        spark = get_spark("samework")
    xml = _synthetic_filing_xml(spark, sf_dir).toPandas()
    filings = pd.DataFrame(
        {
            "filing_name": xml["filing_name"],
            "content": xml["xml"].map(lambda s: s.encode()),
            "publication_time": pd.NaT,
            "taxonomy_version": None,
        }
    )
    kernel = _shred_batches("ferc")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        n = sum(len(out) for out in kernel(iter([filings])))
        best = min(best, time.time() - t0)
    assert n > 0
    if owns:
        spark.stop()
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')")
    out = {
        "xbrl_fact_pipeline": _time_duckdb(con, FACT_PIPELINE_SAMEWORK),
        "xbrl_fuzzy_dedup": _time_duckdb(con, FUZZY_SAMEWORK),
        "xbrl_shredder_roundtrip": _time_shredder_single_process(sf_dir),
    }
    print(json.dumps({"samework": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
