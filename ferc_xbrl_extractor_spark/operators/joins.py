"""Join operators (SURVEY.md §2.3 J1-J3, §2.12 G9).

The reference's only join semantics are equi-inner (context enrichment) and
left-anti (referential integrity). Beyond those, the engine adds the as-of
join a time-series/training-data pipeline needs — implemented with the
union + last-observation-carried-forward pattern, which costs ONE shuffle
(on the join key) + a per-partition sort, instead of the naive
range-join + dedup that explodes quadratically on skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def context_join(pivoted: DataFrame, contexts: DataFrame, keys=("filing_name", "c_id")) -> DataFrame:
    """J1: enrich wide fact rows with their context's PK columns.

    Contexts-per-filing are tiny relative to facts -> broadcast hash join.
    (The main pipeline avoids this join entirely by denormalizing map-side
    in the shredder; this standalone form exists for reference parity and
    for callers holding separately-produced relations.)
    """
    return pivoted.join(F.broadcast(contexts), list(keys), "inner")


def referential_integrity_violations(
    data: DataFrame, ids: DataFrame, keys=("entity_id", "filing_name")
) -> DataFrame:
    """J2: rows of ``data`` with no matching identification row — left anti
    join; an empty result is the invariant (reference
    tests/integration/data_quality_test.py:70-89)."""
    return data.join(ids, list(keys), "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: str | int | float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """G9: for each left row, attach the most recent right row at or before
    its timestamp (direction='backward'; 'forward' mirrors it).

    Implementation: tag both sides, union on (key, time), window-sort once,
    carry the last non-null right value forward. One shuffle on ``on``;
    no range-join blowup; skewed keys are handled by AQE.

    ``tolerance`` bounds how stale the match may be: an interval string
    (e.g. "30 minutes") for timestamp time columns, or a number for
    numeric time axes (versions, sequence numbers).
    """
    lt, rt = F.col(left_time), F.col(right_time)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    left_cols = left.columns
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_values) + ">"
        ).alias("__r"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left_cols) + ">"
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_values]).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # Sort so right rows at the same timestamp come first (<= semantics).
    order = [F.col("__t"), F.col("__is_left")]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__is_left")]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).withColumn(
        "__match_t", F.last(F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True).over(w)
    )

    result = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        bound = (
            F.col("__t") - tol if direction == "backward" else F.col("__t") + tol
        )
        ok = (
            (F.col("__match_t") >= bound)
            if direction == "backward"
            else (F.col("__match_t") <= bound)
        )
        result = result.withColumn(
            "__match", F.when(ok, F.col("__match"))
        )
    return result.select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(c) for c in right_values],
    )
