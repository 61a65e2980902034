"""Operator library: SURVEY.md §2 inventory as pure DataFrame transforms."""

from ferc_xbrl_extractor_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_keep,
    fuzzy_dedup,
)
from ferc_xbrl_extractor_spark.operators.fact_table import construct_table
from ferc_xbrl_extractor_spark.operators.filters import (
    at_least_one_non_null,
    dims_fit_table,
    for_period,
    with_concepts,
)

__all__ = [
    "dedup_exact",
    "dedup_exact_keep",
    "fuzzy_dedup",
    "construct_table",
    "at_least_one_non_null",
    "dims_fit_table",
    "for_period",
    "with_concepts",
]
