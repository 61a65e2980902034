"""Driver-side catalog: TableSpec, taxonomy loading, version merge,
datapackage descriptor emission."""

from ferc_xbrl_extractor_spark.catalog.tablespec import (
    DURATION_PK,
    INSTANT_PK,
    TableSpec,
    merge_specs,
    specs_from_json,
)

__all__ = ["TableSpec", "merge_specs", "specs_from_json", "DURATION_PK", "INSTANT_PK"]
