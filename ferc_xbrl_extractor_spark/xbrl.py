"""One-call library surface mirroring the reference's ``xbrl.extract``
(/root/reference/src/ferc_xbrl_extractor/xbrl.py:28-81) — the entry point
PUDL-style consumers use: filings + taxonomy archive + db_uri in, database +
descriptor + stats out.

The reference returns pandas frames it already materialized; here the heavy
lifting is one lazy Spark program executed exactly once by the staging sink
(see pipeline.sinks.stage_and_sink). ``table_data`` holds the lazy
DataFrames for further composition.
"""

from __future__ import annotations

from collections import namedtuple
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession

ExtractOutput = namedtuple("ExtractOutput", ["table_defs", "table_data", "stats"])


def _parse_db_uri(db_uri: str) -> tuple[str | None, str | None]:
    """Split a db_uri into (sqlite_path, duckdb_path); exactly one is set.

    Accepts sqlalchemy-style ``sqlite:///path`` / ``duckdb:///path`` URIs
    (the reference's surface) and bare paths by extension.
    """
    if db_uri.startswith("sqlite:///"):
        return db_uri[len("sqlite:///"):], None
    if db_uri.startswith("duckdb:///"):
        return None, db_uri[len("duckdb:///"):]
    if db_uri.endswith((".duckdb", ".ddb")):
        return None, db_uri
    return db_uri, None


def extract(
    filings: list[str] | str,
    taxonomy_source: str,
    form_number: int = 1,
    db_uri: str | None = None,
    datapackage_path: str | None = None,
    metadata_path: str | None = None,
    requested_tables: list[str] | None = None,
    instance_pattern: str = "",
    output_dir: str | None = None,
    strict: bool = False,
    spark: SparkSession | None = None,
    workers: int | None = None,  # accepted for signature parity; Spark owns
    batch_size: int | None = None,  # parallelism and batching (SURVEY §2.10)
) -> ExtractOutput:
    """Extract fact tables from XBRL filings and sink them in one call.

    Reference-parity surface (xbrl.py:28-81): ``filings`` may be paths to
    .xbrl files, directories, or zip archives; ``taxonomy_source`` is the
    archive of dated taxonomy zips; ``db_uri`` selects SQLite or DuckDB.
    Additionally ``output_dir`` writes partitioned parquet plus a
    parquet-flavored datapackage descriptor (reference cli.py:185-230).

    Returns ``ExtractOutput(table_defs, table_data, stats)`` where
    ``table_defs`` is the TableSpec catalog, ``table_data`` the (lazy)
    DataFrames, and ``stats`` the per-filing used/total fact counts
    (reference ExtractOutput.stats).
    """
    from ferc_xbrl_extractor_spark.catalog.taxonomy_xml import (
        catalog_from_version,
        merge_catalogs,
        metadata_from_versions,
        parse_taxonomy_archive,
    )
    from ferc_xbrl_extractor_spark.pipeline import sinks
    from ferc_xbrl_extractor_spark.pipeline.extract import extract as run_extract
    from ferc_xbrl_extractor_spark.session import get_spark

    spark = spark or get_spark(f"xbrl-extract-form{form_number}")

    versions = parse_taxonomy_archive(taxonomy_source)
    specs = merge_catalogs(
        {d: catalog_from_version(v) for d, v in sorted(versions.items())}
    )
    if metadata_path:
        import json

        Path(metadata_path).write_text(json.dumps(metadata_from_versions(versions)))

    result = run_extract(
        spark,
        filings,
        specs,
        instance_pattern=instance_pattern or None,
        requested_tables=requested_tables,
    )
    if requested_tables is not None:
        specs = {k: v for k, v in specs.items() if k in requested_tables}
    if strict:
        result.raise_on_conflicts()

    sqlite_path, duckdb_path = _parse_db_uri(db_uri) if db_uri else (None, None)
    if datapackage_path:
        sinks.write_datapackage(
            specs,
            str(datapackage_path),
            db_uri=db_uri if db_uri else None,
        )
    stats: dict[str, Any] = {}
    try:
        sinks.stage_and_sink(
            result.tables,
            specs=specs,
            output_dir=output_dir,
            sqlite_path=sqlite_path,
            duckdb_path=duckdb_path,
        )
        stats = result.stats(list(specs.values()))
    finally:
        result.shredded.unpersist()
    return ExtractOutput(table_defs=specs, table_data=result.tables, stats=stats)
