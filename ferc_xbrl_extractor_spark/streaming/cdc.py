"""Streaming CDC apply: an updates stream continuously merged into a
partitioned parquet table (G20b on streams).

Combines the file-source's exactly-once increment tracking with
``pipeline/upsert.py``: each microbatch of update rows is MERGE-latest
applied, reading and rewriting only the partitions that batch touches.
Replay safety mirrors stream_extract_to_parquet: delivery into
``foreachBatch`` is at-least-once, but the merge is idempotent — a
replayed update row is already the stored survivor, so ``max_by`` re-picks
an identical row and dynamic overwrite rewrites the partition to the same
bytes. Net: effectively-once.

This is the streaming half of table maintenance; compaction
(pipeline/maintenance.py) handles the small files the increments leave
behind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ferc_xbrl_extractor_spark.pipeline.upsert import upsert_parquet


def stream_upsert_parquet(
    updates: DataFrame,
    table_dir: str,
    keys: list[str],
    order_col: str,
    partition_col: str,
    checkpoint_path: str,
    tiebreak: list[str] | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously merge a streaming updates relation into ``table_dir``.

    ``updates`` is any streaming DataFrame carrying the table's columns
    (including ``partition_col`` and ``order_col``). Each microbatch is
    applied with :func:`upsert_parquet` — partition-pruned read of the
    touched slices, one ``max_by`` merge aggregate, dynamic-overwrite
    commit.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet(
            batch_df.sparkSession,
            table_dir,
            batch_df,
            keys=keys,
            order_col=order_col,
            partition_col=partition_col,
            tiebreak=tiebreak,
        )

    writer = (
        updates.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
