"""Predicates P1-P7 (SURVEY.md §2.2) as Catalyst expressions.

All of these are pure column expressions — no joins, no UDFs — so they
vectorize in whole-stage codegen and push down through the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def non_null_value(df: DataFrame, col: str = "value") -> DataFrame:
    """P1: drop facts whose raw value is null (reference instance.py:395)."""
    return df.filter(F.col(col).isNotNull())


def for_period(df: DataFrame, instant: bool) -> DataFrame:
    """P2: route facts to instant vs duration tables (instance.py:316)."""
    return df.filter(F.col("instant") == F.lit(instant))


def with_concepts(df: DataFrame, concept_names: list[str]) -> DataFrame:
    """P3: semi-filter facts to a table's data columns (instance.py:318-320).

    ``isin`` over a driver-known list compiles to an in-set predicate that
    Catalyst can push to the scan; no join needed.
    """
    return df.filter(F.col("name").isin(list(concept_names)))


def dims_fit_predicate(pk_axes: list[str], dims_col: str = "dims") -> Column:
    """P4: a context fits a table iff its dim keys ⊆ the table's PK axes
    (instance.py:159-169). Facts *missing* an axis still fit — they are the
    'total' slice (the backfill happens in the PK projection, P7)."""
    axes = F.array(*[F.lit(a) for a in pk_axes]) if pk_axes else F.array()
    return F.forall(
        F.map_keys(F.coalesce(F.col(dims_col), F.create_map())),
        lambda k: F.array_contains(axes, k) if pk_axes else F.lit(False),
    )


def dims_fit_table(df: DataFrame, pk_axes: list[str]) -> DataFrame:
    return df.filter(dims_fit_predicate(pk_axes))


def at_least_one_non_null(df: DataFrame, data_columns: list[str]) -> DataFrame:
    """P6: drop rows where every data column is null (datapackage.py:458).

    Built as ONE SQL text filter, not a Column-API OR fold: the fold cost
    2 py4j round-trips per column (~500 driver⇄JVM crossings on a
    255-column table) to construct the same expression tree."""
    if not data_columns:
        return df
    quoted = ("`" + c.replace("`", "``") + "`" for c in data_columns)
    return df.filter(" OR ".join(f"{q} IS NOT NULL" for q in quoted))


def axis_with_total(dims_col: str, axis: str) -> Column:
    """P7 axis backfill: a context lacking an axis represents the total
    slice (instance.py:178) — ``coalesce(dims[axis], 'total')``."""
    return F.coalesce(F.col(dims_col).getItem(axis), F.lit("total")).alias(axis)
