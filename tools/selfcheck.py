"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables, then
compares row count, column names/order-insensitive values. Usage:

    python tools/selfcheck.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            nonnull = s.dropna()
            fmt = (
                "%Y-%m-%d"
                if len(nonnull) and (nonnull.dt.normalize() == nonnull).all()
                else "%Y-%m-%d %H:%M:%S.%f"
            )
            df[c] = s.dt.strftime(fmt).fillna("NULL")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: f"{v:.6f}" if pd.notna(v) else "NULL")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.map(lambda v: str(bool(v)) if pd.notna(v) else "NULL")
        else:
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(v))
    return df


def value_hash(df: pd.DataFrame) -> str:
    norm = _normalize(df)
    rows = sorted("\x1f".join(r) for r in norm.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from ferc_xbrl_extractor_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.sql(
            f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            failures.append(name)
            continue
        spark_secs = time.time() - t0
        if name not in oracles:
            status = "rows-only"
            print(
                f"ok?  {name}: {len(sdf)} rows ({status}, no oracle) "
                f"[spark {spark_secs:.1f}s]"
            )
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows on a rows-only query")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            ns, no = _normalize(sdf), _normalize(odf)
            ks = set(map(tuple, ns.itertuples(index=False, name=None)))
            ko = set(map(tuple, no.itertuples(index=False, name=None)))
            print("  spark-only:", list(ks - ko)[:3])
            print("  oracle-only:", list(ko - ks)[:3])
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS {name}: {len(sdf)} rows [spark {spark_secs:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
