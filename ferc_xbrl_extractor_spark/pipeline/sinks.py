"""Sinks (SURVEY.md §2.8 K1-K5).

- Parquet: native distributed write — the cluster-scale sink.
- SQLite: single-writer by design; tables are serialized through the driver
  exactly like the reference (cli.py:97-127). Used for small final outputs,
  never for the 100 TB path.
- DuckDB: parquet is the interchange (duckdb has no Spark connector);
  CREATE TABLE ... AS FROM read_parquet on the driver.
- Datapackage JSON descriptor (frictionless-shaped; validation runs when the
  ``frictionless`` package is importable, otherwise it's emitted unvalidated).
"""

from __future__ import annotations

import json
import sqlite3
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from pyspark.sql import DataFrame

from ferc_xbrl_extractor_spark.catalog.tablespec import TableSpec


def write_parquet(
    tables: dict[str, DataFrame],
    out_dir: str,
    single_file: bool = False,
    max_parallel: int = 8,
    partition_by: list[str] | None = None,
) -> None:
    """K3: one parquet dataset per table.

    Writes run from a thread pool — each .write is a separate Spark job and
    the scheduler interleaves their stages, keeping all executors busy
    instead of draining the cluster one table at a time.

    ``partition_by`` (e.g. ["filing_name"]) produces hive-partitioned
    layout, giving downstream readers partition pruning on the named
    columns — the right default at 100 TB where consumers slice by filing
    or period (columns must exist in every table passed).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def _write(item):
        name, df = item
        target = df.coalesce(1) if single_file else df
        writer = target.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(out / name))

    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        list(pool.map(_write, tables.items()))


def write_bucketed(
    tables: dict[str, DataFrame],
    bucket_cols: list[str],
    num_buckets: int = 64,
    database: str | None = None,
) -> None:
    """K3 at-scale variant: persist tables bucketed (and sorted) on the
    join/group key via ``bucketBy`` + ``saveAsTable``.

    A downstream equi-join or aggregation on ``bucket_cols`` between two
    tables bucketed the same way runs with ZERO exchanges — the scan
    itself reports the hash distribution (pinned in
    tests/test_plans.py::test_bucketed_join_skips_exchange). This is the
    co-located-join strategy for relations too big to broadcast, e.g.
    facts × per-filing metadata at 100 TB.
    """
    for name, df in tables.items():
        target = f"{database}.{name}" if database else name
        (
            df.write.mode("overwrite")
            .bucketBy(num_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .saveAsTable(target)
        )


def write_sqlite(
    tables: dict[str, DataFrame], db_path: str, staging_dir: str | None = None
) -> None:
    """K1: serialize tables into SQLite via the driver (single-writer).

    SQLite is inherently a driver-side single-writer sink, but the driver
    never materializes a whole table: Spark writes parquet distributed
    (same staging pattern as the DuckDB sink), then the driver streams it
    into SQLite one record batch at a time via a pyarrow dataset scan.
    Peak driver memory is one batch (~100k rows), independent of table
    size — the previous ``df.toPandas()`` collect was a scale-killer for
    any table bigger than driver RAM.

    ``staging_dir``: a directory already holding ``write_parquet`` output
    for these tables — reused as-is (no rewrite, not deleted). When None,
    a temp staging dir is written and cleaned up."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads

    owns_staging = staging_dir is None
    staging = staging_dir or tempfile.mkdtemp(prefix="sqlite_stage_")
    if owns_staging:
        write_parquet(tables, staging)
    conn = sqlite3.connect(db_path)
    try:
        for name, df in tables.items():
            first = True
            ds = pads.dataset(f"{staging}/{name}", format="parquet")
            for batch in ds.to_batches(batch_size=100_000):
                batch.to_pandas().to_sql(
                    name, conn, if_exists="replace" if first else "append", index=False
                )
                first = False
            if first:  # empty table: still create it with the right columns
                df.limit(0).toPandas().to_sql(
                    name, conn, if_exists="replace", index=False
                )
        conn.commit()
    finally:
        conn.close()
        if owns_staging:
            shutil.rmtree(staging, ignore_errors=True)


def write_duckdb(
    tables: dict[str, DataFrame], db_path: str, staging_dir: str | None = None
) -> None:
    """K2: stage parquet from Spark, CTAS into DuckDB on the driver.

    ``staging_dir`` semantics match ``write_sqlite``: an existing
    ``write_parquet`` layout is reused as-is; None stages to a temp dir
    and cleans it up."""
    import shutil
    import tempfile

    import duckdb

    owns_staging = staging_dir is None
    staging = staging_dir or tempfile.mkdtemp(prefix="duckdb_stage_")
    if owns_staging:
        write_parquet(tables, staging)
    con = duckdb.connect(db_path)
    try:
        for name in tables:
            con.execute(
                f'CREATE OR REPLACE TABLE "{name}" AS '
                f"SELECT * FROM read_parquet('{staging}/{name}/*.parquet')"
            )
    finally:
        con.close()
        if owns_staging:
            shutil.rmtree(staging, ignore_errors=True)


def datapackage_descriptor(
    specs: dict[str, TableSpec], name: str = "ferc-xbrl-extractor-spark"
) -> dict:
    """K4: Frictionless datapackage descriptor for the output tables."""
    resources = []
    for spec in specs.values():
        fields = []
        for pk in spec.primary_key:
            # Reference descriptor types (datapackage.py:75-113): date PK
            # columns are declared 'date' (values stay ISO strings on disk,
            # as the reference stores them), publication_time 'datetime',
            # everything else 'string'.
            if pk == "publication_time":
                ftype = "datetime"
            elif pk in ("date", "start_date", "end_date"):
                ftype = "date"
            else:
                ftype = "string"
            fields.append({"name": pk, "type": ftype})
        for col in spec.data_columns:
            fields.append({"name": col, "type": spec.columns[col]})
        resources.append(
            {
                "name": spec.name,
                "profile": "tabular-data-resource",
                "schema": {
                    "fields": fields,
                    "primaryKey": list(spec.primary_key),
                },
            }
        )
    return {"name": name, "profile": "tabular-data-package", "resources": resources}


def write_datapackage(
    specs: dict[str, TableSpec], path: str, validate: bool = True
) -> dict:
    doc = datapackage_descriptor(specs)
    if validate:
        try:
            import frictionless

            report = frictionless.Package.validate_descriptor(doc)
            if not report.valid:
                raise RuntimeError(f"Invalid datapackage descriptor: {report}")
        except ImportError:
            pass  # validation is best-effort; the descriptor is still written
    Path(path).write_text(json.dumps(doc, indent=2, default=str))
    return doc
