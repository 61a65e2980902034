"""Parquet star-schema source with nanosecond-timestamp normalization.

Spark's parquet reader rejects INT64 TIMESTAMP(NANOS) columns
(PARQUET_TYPE_ILLEGAL) — a real-world hazard for data written by pandas/
Arrow with ns precision. This loader inspects the file footer driver-side
(one cheap metadata read per table, never a data scan), switches on the
``nanosAsLong`` legacy read path only when needed, and rebuilds proper
microsecond timestamps with integer arithmetic (``div 1000`` — not float
division, which loses precision above 2^53 ns ≈ 104 days of epoch time).

DuckDB performs the same ns→us truncation when reading such files, so both
engines observe identical instants — required for oracle comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _nano_columns(path: str) -> list[str]:
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` with ns-timestamp repair."""
    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_columns(path)
    if nano_cols:
        spark.conf.set(NANOS_CONF, "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df
