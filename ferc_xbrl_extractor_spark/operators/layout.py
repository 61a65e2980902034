"""G25: Z-order (Morton) clustering for multi-column data skipping.

Parquet scans prune row groups / files with min-max statistics, but a
layout sorted on one column leaves every OTHER column's min-max spanning
the full domain — a filter on the second column prunes nothing. Writing
rows ordered by the bit-interleaved Z-value of several columns bounds
EVERY interleaved column's span per file (each file covers a small hyper-
rectangle of the key space), so selective filters on any of them skip
most of a 100-TB table's files.

Spark-first: the Z-value is a pure Catalyst bit expression (unrolled
``shiftleft``/``bitwise OR`` — codegen'd, no UDF); the layout step is the
standard ``repartitionByRange(z) .sortWithinPartitions(z)`` write recipe,
i.e. a single range exchange that doubles as the file splitter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer columns,
    ``bits`` low bits each (values are masked to ``bits`` — callers
    should rank/bucket arbitrary domains into 0..2^bits-1 first, e.g.
    with ``F.ntile`` or min-max scaling). Bit j of column i lands at
    output bit ``j * n_cols + i``; total width ``bits * n_cols`` must fit
    a long (<= 62)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue needs at least two columns")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows a long")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``: one
    range exchange on the Z-value, sorted within partitions, so each
    output file covers a compact hyper-rectangle and min-max stats prune
    on EVERY clustered column. ``num_files`` controls the range partition
    count (default: current shuffle parallelism)."""
    z = zvalue(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(num_files, "__z")
        if num_files
        else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def file_spans(spark, path: str, cols: list[str]):
    """Per-file (min, max) spans of ``cols`` — the pruning telemetry used
    to validate a layout (narrow spans == effective skipping)."""
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("__file").agg(*aggs)
