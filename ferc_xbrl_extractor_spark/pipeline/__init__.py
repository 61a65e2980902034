"""Extract lifecycle + sinks + incremental table maintenance."""

from ferc_xbrl_extractor_spark.pipeline.extract import ExtractResult, extract
from ferc_xbrl_extractor_spark.pipeline.upsert import merge_latest, upsert_parquet

__all__ = ["extract", "ExtractResult", "merge_latest", "upsert_parquet"]
