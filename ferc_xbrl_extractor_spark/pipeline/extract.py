"""The extract lifecycle (SURVEY.md §3.2), Spark-first.

Reference shape: driver batches filings over a process pool, each worker
shreds + builds all tables for its batch, driver concats per table
(xbrl.py:84-136). Spark shape: ONE lazy program —

    scan filings -> rlike filter -> mapInPandas shred  (persisted once)
      -> per TableSpec: filter -> dedup -> pivot -> cast  (independent plans)

The shredded long relation is persisted so the N per-table plans share one
parse pass. Each table plan is a single-shuffle job (see
operators.fact_table); tables are independent, so on a cluster they are
scheduled concurrently by the Spark scheduler (and we kick them off from a
thread pool when writing).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

from ferc_xbrl_extractor_spark.catalog.tablespec import TableSpec
from ferc_xbrl_extractor_spark.operators.fact_table import construct_table_with_errors
from ferc_xbrl_extractor_spark.operators.stats import (
    consumed_keys_for_tables,
    used_fact_stats,
)
from ferc_xbrl_extractor_spark.sources.filings import scan_filings
from ferc_xbrl_extractor_spark.sources.shredder import (
    contexts_from,
    facts_from,
    shred_filings,
)


@dataclass
class ExtractResult:
    """Lazy handles to everything the run produced."""

    facts: DataFrame
    contexts: DataFrame
    tables: dict[str, DataFrame]
    # Per-table quarantined fuzzy-dedup conflicts (filing_name, c_id, name,
    # values) — the rows the reference raises ValueError on (E2). Empty
    # DataFrames when the data is clean.
    errors: dict[str, DataFrame]
    shredded: DataFrame  # persisted; call .unpersist() when done

    def used_fact_ratios(self, specs: list[TableSpec]) -> DataFrame:
        consumed = consumed_keys_for_tables(self.facts, specs)
        return used_fact_stats(self.facts, consumed)

    def stats(self, specs: list[TableSpec]) -> dict[str, dict[str, int]]:
        """A8: the reference's per-filing stats artifact
        ({filing: {used_facts, total_facts}}, ExtractOutput.stats /
        xbrl.py:120-136). The reference merges per-batch fact-id dicts on
        the driver; here the same quantities fall out of one aggregate over
        the facts relation — no driver-side set mutation to merge."""
        return {
            r["filing_name"]: {
                "used_facts": r["used_facts"],
                "total_facts": r["total_facts"],
            }
            for r in self.used_fact_ratios(specs).collect()
        }

    def raise_on_conflicts(self, max_show: int = 5) -> None:
        """Strict mode (reference E2 semantics): fail the run if any table
        quarantined a conflict. Driver-side check over already-built lazy
        plans; run it before sinking when reference parity matters."""
        for name, err in self.errors.items():
            bad = err.limit(max_show).collect()
            if bad:
                detail = "; ".join(
                    f"{r['filing_name']}:{r['c_id']}:{r['name']} {list(r['values'])}"
                    for r in bad
                )
                raise ValueError(
                    f"table {name}: unresolvable duplicate facts — {detail}"
                )


def extract(
    spark: SparkSession,
    filings_path: str | list[str],
    specs: dict[str, TableSpec],
    instance_pattern: str | None = None,
    requested_tables: list[str] | None = None,
    fact_prefix: str = "ferc",
    typed_dates: bool = False,
) -> ExtractResult:
    """Run the full pipeline lazily; returns DataFrames, not materialized
    data — callers write/collect as needed.

    ``requested_tables`` prunes the plan set before anything runs (S6).
    """
    if requested_tables is not None:
        specs = {k: v for k, v in specs.items() if k in requested_tables}

    filings = scan_filings(spark, filings_path, instance_pattern=instance_pattern)
    # MEMORY_AND_DISK: at 100 TB the shredded relation won't fit in memory;
    # spilled partitions still beat re-parsing XML for all ~255 table plans.
    shredded = shred_filings(filings, fact_prefix).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    facts = facts_from(shredded)
    contexts = contexts_from(shredded)

    tables: dict[str, DataFrame] = {}
    errors: dict[str, DataFrame] = {}
    for name, spec in specs.items():
        built = construct_table_with_errors(facts, spec, typed_dates=typed_dates)
        tables[name] = built.data
        errors[name] = built.errors
    return ExtractResult(
        facts=facts,
        contexts=contexts,
        tables=tables,
        errors=errors,
        shredded=shredded,
    )
