"""Per-table materialization: the reference's FactTable.construct_dataframe
(/root/reference/src/ferc_xbrl_extractor/datapackage.py:411-459) as one
declarative Spark plan.

Stage order matters for determinism (SURVEY.md §7.4): exact dedup runs
*before* fuzzy dedup, and the pivot's ``first()`` only ever sees singleton
(key, name) groups, so it is deterministic without a sort.

Shuffle budget per table: exactly ONE. The shredder already denormalized the
context PK onto every fact row (see sources.shredder), so:

    filter (period ∧ concept-set ∧ dims-fit)       — map-side, pushed down
    -> exact dedup + fuzzy dedup (window on key)   — shuffle on the fact key
    -> pivot groupBy(PK + c_id)                    — reuses that clustering
    -> cast / reindex / null-prune                 — map-side

The reference instead joins facts to contexts per table (J1); our J1
equivalent is the map-side denormalization, with the standalone broadcast
join form kept in operators.joins for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.catalog.tablespec import TableSpec
from ferc_xbrl_extractor_spark.functions.casts import spark_type_for
from ferc_xbrl_extractor_spark.operators import filters
from ferc_xbrl_extractor_spark.operators.dedup import dedup_exact, fuzzy_dedup


def construct_table(
    facts: DataFrame,
    spec: TableSpec,
    typed_dates: bool = False,
    deterministic_order: bool = False,
) -> DataFrame:
    """Build one output table from the (denormalized) long facts relation.

    Args:
        facts: output of ``sources.shredder.facts_from``.
        spec: the table's schema contract.
        typed_dates: cast date PK columns to DateType (Spark-native surface)
            instead of the reference's ISO strings.
        deterministic_order: end with orderBy(PK) — needed only for golden
            comparisons / single-file sinks; a cluster sink should stay
            unordered and let the writer bucket it.
    """
    fact_key = ["filing_name", "c_id", "name"]

    selected = filters.with_concepts(
        filters.for_period(facts, spec.instant), spec.data_columns
    )
    selected = filters.dims_fit_table(selected, spec.axes)

    # A2 exact dedup on (key, value), then A3 fuzzy resolve to one value/key.
    deduped = dedup_exact(selected, fact_key + ["value"])
    resolved = fuzzy_dedup(deduped, fact_key).resolved

    # PK projection (P7): context columns + axis backfill to 'total'.
    if spec.instant:
        date_cols = [F.col("end_date").alias("date")]
    else:
        date_cols = [F.col("start_date"), F.col("end_date")]
    pk_exprs = (
        [F.col("entity_id"), F.col("filing_name"), F.col("publication_time")]
        + date_cols
        + [filters.axis_with_total("dims", axis) for axis in spec.axes]
    )
    keyed = resolved.select(*pk_exprs, F.col("c_id"), F.col("name"), F.col("value"))

    # A1: long -> wide. Explicit value list = no extra distinct scan, and the
    # groupBy keys extend the fuzzy-dedup clustering, so AQE plans this
    # without a second full shuffle.
    pivot_keys = [c for c in keyed.columns if c not in ("name", "value")]
    wide = (
        keyed.groupBy(*pivot_keys)
        .pivot("name", spec.data_columns)
        .agg(F.first("value"))
        .drop("c_id")
    )

    # F9 casts + P5 reindex to the declared column order.
    out_cols = []
    for pk in spec.primary_key:
        col = F.col(pk)
        if typed_dates and pk in ("date", "start_date", "end_date"):
            col = col.cast("date")
        out_cols.append(col.alias(pk))
    for name in spec.data_columns:
        target = spark_type_for(spec.columns[name], typed_dates)
        out_cols.append(F.col(name).try_cast(target).alias(name))
    result = wide.select(*out_cols)

    # P6: drop rows where every data column is null.
    result = filters.at_least_one_non_null(result, spec.data_columns)

    if deterministic_order:
        result = result.orderBy(*spec.primary_key)
    return result
