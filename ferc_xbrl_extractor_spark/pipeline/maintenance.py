"""Table maintenance: small-file compaction for partitioned parquet.

Incremental writers (streaming foreachBatch sinks, per-increment upserts —
streaming/ingest.py, pipeline/upsert.py) accumulate many small part files
per partition; at 100 TB the resulting listing/open overhead dominates scan
time (every file is a task + a footer read + an object-store request). This
module rewrites ONLY the partitions whose file layout is degenerate,
coalescing each to a byte-budgeted file count — the cost scales with the
degenerate slice, never the table.

Spark-first design: the scan is a normal pruned parquet read (Catalyst
partition filter), the rewrite is ``coalesce(n)`` (a narrow dependency — no
shuffle) per partition, committed with dynamic partition overwrite so
healthy partitions keep their exact files.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PartitionLayout:
    value: str
    n_files: int
    total_bytes: int


def partition_layouts(table_dir: str, partition_col: str) -> list[PartitionLayout]:
    """Driver-side listing of ``{partition_col}=value`` dirs: file count +
    bytes per partition. Listing cost is O(files), the same listing any
    scan planner pays, and nothing is read beyond directory metadata."""
    out = []
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(table_dir)):
        if not entry.startswith(prefix):
            continue
        d = os.path.join(table_dir, entry)
        files = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        # Hive escapes special characters in partition dir names
        # (%-encoding, e.g. "a b" -> "a%20b"); report the DECODED value so
        # filters against the partition column actually match.
        out.append(
            PartitionLayout(
                value=unquote(entry[len(prefix):]),
                n_files=len(files),
                total_bytes=sum(os.path.getsize(f) for f in files),
            )
        )
    return out


def compact_partitions(
    spark: SparkSession,
    table_dir: str,
    partition_col: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_files_per_partition: int = 4,
) -> dict[str, int]:
    """Rewrite partitions that have more than ``max_files_per_partition``
    files AND more files than their byte size justifies, coalescing each to
    ``ceil(bytes / target_file_bytes)`` files. Returns
    ``{partition_value: new_file_count}`` for the rewritten partitions.

    Healthy partitions are never opened: the read is partition-pruned to
    the degenerate set, and dynamic overwrite leaves every other
    partition's files bit-for-bit in place.
    """
    plan: dict[str, int] = {}
    for layout in partition_layouts(table_dir, partition_col):
        want = max(1, math.ceil(layout.total_bytes / target_file_bytes))
        if layout.n_files > max(want, max_files_per_partition):
            plan[layout.value] = want
    if not plan:
        return {}
    # One pruned job per degenerate partition: coalesce(want) pins the
    # exact output file count (a grouped multi-partition coalesce cannot —
    # any task holding rows of two values writes a file for each). Jobs
    # are tiny (one partition's bytes) and the loop length is the number
    # of *degenerate* partitions, not the table's. The DataFrame (and its
    # file listing / schema inference) is built ONCE; each iteration only
    # adds a partition filter to it.
    table = spark.read.parquet(table_dir)
    for value, want in plan.items():
        (
            table.filter(F.col(partition_col) == value)
            .coalesce(want)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(table_dir)
        )
    return plan
