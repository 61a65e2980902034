"""Quality/statistics aggregates (SURVEY.md §2.4 A4-A7, §2.11).

The reference tracks used-fact coverage by mutating a shared set per table
(datapackage.py:420) — inherently sequential. Here the same quantities are
pure dataflow: consumed keys are a DataFrame union, coverage is a semi-join
aggregate, and every invariant is a query returning violations (empty ==
healthy), so checks run cluster-side with no driver state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FACT_KEY = ["filing_name", "c_id", "name"]


def fact_id_counts(facts: DataFrame) -> DataFrame:
    """A4: multiplicity of each fact id (c_id:name per filing)."""
    return facts.groupBy(*FACT_KEY).agg(F.count(F.lit(1)).alias("n"))


def duplicated_fact_ids(facts: DataFrame) -> DataFrame:
    return fact_id_counts(facts).filter(F.col("n") >= 2)


def used_fact_stats(facts: DataFrame, consumed_keys: DataFrame) -> DataFrame:
    """A5: per-filing used/total distinct fact ids + ratio.

    ``consumed_keys`` is the union of (filing_name, c_id, name) actually
    materialized into tables — the pure-dataflow replacement for the
    reference's used_fact_ids set mutation.
    """
    total = (
        facts.select(*FACT_KEY)
        .distinct()
        .groupBy("filing_name")
        .agg(F.count(F.lit(1)).alias("total_facts"))
    )
    used = (
        facts.select(*FACT_KEY)
        .distinct()
        .join(consumed_keys.select(*FACT_KEY).distinct(), FACT_KEY, "left_semi")
        .groupBy("filing_name")
        .agg(F.count(F.lit(1)).alias("used_facts"))
    )
    return (
        total.join(used, "filing_name", "left")
        .withColumn("used_facts", F.coalesce("used_facts", F.lit(0)))
        .withColumn("ratio", F.col("used_facts") / F.col("total_facts"))
    )


def consumed_keys_for_tables(facts: DataFrame, specs) -> DataFrame:
    """Union of fact keys consumed by a set of TableSpecs (pre-dedup, like
    the reference which records raw_facts before dropping duplicates)."""
    from ferc_xbrl_extractor_spark.operators import filters

    parts = []
    for spec in specs:
        part = filters.with_concepts(
            filters.for_period(facts, spec.instant), spec.data_columns
        )
        part = filters.dims_fit_table(part, spec.axes)
        parts.append(part.select(*FACT_KEY))
    if not parts:
        return facts.select(*FACT_KEY).limit(0)
    return reduce(DataFrame.unionByName, parts).distinct()


def rows_all_null(df: DataFrame, data_columns: list[str]) -> DataFrame:
    """A7 violation query: rows with every data column null."""
    pred = F.lit(True)
    for c in data_columns:
        pred = pred & F.col(c).isNull()
    return df.filter(pred)


def table_counts(tables: dict[str, DataFrame]) -> dict[str, int]:
    """A6: per-table row counts (driver-side dict, one count job each)."""
    return {name: df.count() for name, df in tables.items()}
