"""Stream-stream joins (G12 surface): watermarked time-interval joins.

Spark's stream-stream inner join buffers both sides in state; without a
time bound that state grows forever. The canonical bounded form — and the
one implemented here — pairs watermarks on BOTH inputs with a time-range
join condition, which lets the engine evict a buffered row as soon as the
other side's watermark passes the far edge of its match window
(state ∝ rate × (lower + upper + watermark), independent of stream age).

This is the streaming counterpart of ``operators.joins.interval_join``:
the batch form bucketizes the time axis because batch has no state; the
streaming form leans on the state store and the watermark instead, and
Spark plans it as a StreamingSymmetricHashJoin keyed on the equi keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    keys: list[str] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join two streams: a left row matches right rows with
    ``right_ts`` in ``[left_ts - lower, left_ts + upper]``, joined on the
    required equi ``keys`` (they become the state-store partitioning
    key — Spark rejects a stream-stream join with no equality predicate
    at all, so at least one key is mandatory).

    Both timestamp columns must be distinct names (rename before calling
    otherwise), and the same applies to EVERY non-key column: only the
    equi ``keys`` are deduplicated in the output, so any other column
    name present on both sides survives twice and downstream references
    to it are ambiguous — rename shared non-key columns before calling.
    Output carries both sides' columns qualified-free.
    """
    if not keys:
        raise ValueError(
            "stream_interval_join requires at least one equi key — Spark "
            "does not support stream-stream joins without an equality "
            "predicate (the time-range condition alone is not one)"
        )
    shared = sorted(
        (set(left.columns) & set(right.columns)) - set(keys)
    )
    if shared:
        raise ValueError(
            f"stream_interval_join: non-key columns {shared} exist on both "
            "sides and would survive as ambiguous duplicates — rename them "
            "on one side before joining"
        )
    l = left.withWatermark(left_ts, watermark).alias("__sl")
    r = right.withWatermark(right_ts, watermark).alias("__sr")
    cond = (
        F.col(f"__sr.{right_ts}")
        >= F.col(f"__sl.{left_ts}") - F.expr(f"INTERVAL {lower}")
    ) & (
        F.col(f"__sr.{right_ts}")
        <= F.col(f"__sl.{left_ts}") + F.expr(f"INTERVAL {upper}")
    )
    for k in keys or []:
        cond = cond & (F.col(f"__sl.{k}") == F.col(f"__sr.{k}"))
    joined = l.join(r, cond, "inner")
    # project the key columns once (they appear on both sides)
    drop_right = [joined["__sr." + k] for k in (keys or [])]
    out = joined
    for c in drop_right:
        out = out.drop(c)
    return out
