"""Incremental corpus dedup against an on-disk fingerprint index.

Re-running corpus-wide dedup per ingestion increment is O(corpus) work
for O(increment) new data — the same ceiling the reference hits
rebuilding every table per run (ref:xbrl.py:28-81). This module keeps a
persistent fingerprint index (hive-partitioned parquet, keyed by a
fingerprint prefix) and dedups each new batch against it WITHOUT ever
shuffling the index:

1. batch-internal dedup: one ``min_by`` survivor aggregate per
   fingerprint (the G1 shape).
2. historical check: the batch's distinct fingerprints are **broadcast**
   and the index is pruned to the partitions the batch's prefixes touch,
   then probed map-side with a broadcast LEFT SEMI join — the index is
   only scanned (never shuffled), and only its touched slices.
3. survivors = batch anti-joined against the (small) collided set —
   another broadcast join.
4. the survivors' fingerprints are appended to the index, partitioned by
   prefix, keeping future probes pruned.

Cost per increment: O(increment) shuffle + O(touched index partitions)
scan. At 100 TB of corpus and a daily increment, that is the difference
between a full-corpus MinHash job and a minute of work.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.operators.text import fingerprint

PREFIX_COL = "fp_pfx"


def _with_prefix(df: DataFrame, prefix_len: int) -> DataFrame:
    return df.withColumn(PREFIX_COL, F.substring("fp", 1, prefix_len))


def index_init(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    prefix_len: int = 2,
) -> None:
    """Create/overwrite the fingerprint index from an existing corpus."""
    fps = fingerprint(docs, text_col).select("fp").distinct()
    (
        _with_prefix(fps, prefix_len)
        .repartition(F.col(PREFIX_COL))
        .write.mode("overwrite")
        .partitionBy(PREFIX_COL)
        .parquet(index_dir)
    )


@dataclass
class IncrementResult:
    fresh: DataFrame               # surviving new docs (with their ``fp``)
    n_fresh: int | None            # populated when collect_stats
    n_batch_dups: int | None       # collapsed within the batch
    n_historical_dups: int | None  # suppressed by the index


def incremental_dedup(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
    update_index: bool = True,
    collect_stats: bool = False,
) -> IncrementResult:
    """Dedup an ingestion batch against itself and the historical index.

    The survivor per batch fingerprint is the min ``id_col`` row
    (deterministic). With ``update_index`` the survivors are materialized
    with an eager ``localCheckpoint`` BEFORE the append: the append must
    not be visible to the batch's own probe, and a mere ``persist`` is
    NOT enough — writing to the index path refreshes Spark's cache over
    that path, silently recomputing ``fresh`` against the just-updated
    index (everything would collide). Lineage truncation makes ``fresh``
    independent of the index files. With ``collect_stats`` the
    batch/historical duplicate counts are computed (two extra count jobs —
    leave off in latency-sensitive paths).
    """
    fp_docs = fingerprint(batch, text_col)
    payload = [c for c in fp_docs.columns if c != "fp"]
    surv = (
        fp_docs.groupBy("fp")
        .agg(
            F.min_by(F.struct(*payload), F.col(id_col)).alias("_row"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select("fp", *[F.col(f"_row.{c}").alias(c) for c in payload])
    )

    # Prefix pruning bounds the index scan; the broadcast semi-join probes
    # it map-side. 16^prefix_len partition values at most — the driver
    # collect is tiny and independent of batch size.
    batch_fps = surv.select("fp")
    touched = [
        r[0]
        for r in _with_prefix(batch_fps, prefix_len)
        .select(PREFIX_COL)
        .distinct()
        .collect()
    ]
    index = spark.read.parquet(index_dir).filter(
        F.col(PREFIX_COL).isin(touched)
    )
    collided = index.join(F.broadcast(batch_fps), "fp", "left_semi").select("fp")
    fresh = surv.join(F.broadcast(collided), "fp", "left_anti")

    n_fresh = n_batch = n_surv = None
    if update_index or collect_stats:
        fresh = fresh.localCheckpoint(eager=True)
        n_fresh = fresh.count()
    if collect_stats:
        n_batch = fp_docs.count()
        n_surv = surv.count()
    if update_index and n_fresh:
        (
            _with_prefix(fresh.select("fp"), prefix_len)
            .write.mode("append")
            .partitionBy(PREFIX_COL)
            .parquet(index_dir)
        )
    return IncrementResult(
        fresh=fresh,
        n_fresh=n_fresh,
        n_batch_dups=None if n_batch is None else n_batch - n_surv,
        n_historical_dups=None if n_surv is None else n_surv - n_fresh,
    )
