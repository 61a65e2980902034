"""Per-table materialization: the reference's FactTable.construct_dataframe
(/root/reference/src/ferc_xbrl_extractor/datapackage.py:411-459) as one
declarative Spark plan.

Stage order matters for determinism (SURVEY.md §7.4): exact dedup runs
*before* fuzzy dedup, and the pivot's ``first()`` only ever sees singleton
(key, name) groups, so it is deterministic without a sort.

Shuffle budget per table: exactly ONE. The shredder already denormalized the
context PK onto every fact row (see sources.shredder), and the plan opens
with an explicit ``repartition(filing_name, c_id)``. Every downstream
stateful operator's required clustering is a *superset* of those two keys —
exact dedup groups on the full row, the fuzzy-dedup aggregate groups on
(filing, c_id, name), the pivot groups on (filing, c_id) — and Spark's
HashPartitioning(subset) satisfies ClusteredDistribution(superset), so
Catalyst plans them all over the single exchange. Sort budget: exactly ONE —
the fuzzy aggregate's key sort; the pivot aggregate consumes a *prefix* of
that order, so its Sort node is elided (pinned by tests/test_plans.py).

    filter (period ∧ concept-set ∧ dims-fit)       — map-side, pushed down
    -> repartition(filing_name, c_id)              — THE shuffle
    -> exact dedup (grouping-only HashAggregate)   — no exchange, no sort
    -> fuzzy dedup (one agg, sort by fact key)     — no exchange, THE sort
    -> pivot groupBy(filing, c_id) max(when)       — no exchange, no sort
    -> cast / reindex / null-prune                 — map-side

The reference instead joins facts to contexts per table (J1); our J1
equivalent is the map-side denormalization, with the standalone broadcast
join form kept in operators.joins for parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.catalog.tablespec import TableSpec
from ferc_xbrl_extractor_spark.functions.casts import spark_type_for
from ferc_xbrl_extractor_spark.operators import filters
from ferc_xbrl_extractor_spark.operators.dedup import fuzzy_dedup

NUMBER_TYPES = {"number"}
INTEGER_TYPES = {"integer", "year"}


def _bq(name: str) -> str:
    """Backtick-quote an identifier for SQL text (`` escapes a backtick)."""
    return "`" + name.replace("`", "``") + "`"


def _sq(s: str) -> str:
    """Escape a string literal's single quotes for SQL text."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


@dataclass
class TableResult:
    """One output table plus its quarantined dedup conflicts (A3 errors:
    (filing_name, c_id, name, values) rows the reference would have raised
    ValueError on — reference datapackage.py:570-572)."""

    data: DataFrame
    errors: DataFrame


def _normalize_values(selected: DataFrame, spec: TableSpec) -> DataFrame:
    """Normalize raw fact strings per the column's *declared* type before
    dedup, like the reference's CONVERT_DTYPES-before-drop_duplicates
    (datapackage.py:430-437): '1.0' and '1.00' must be exact duplicates of
    a number column, not a precision tie. Unparseable values pass through
    raw (they surface as conflicts/nulls downstream, never task failures).
    """
    num_names = [c for c, t in spec.columns.items() if t in NUMBER_TYPES]
    int_names = [c for c, t in spec.columns.items() if t in INTEGER_TYPES]
    value = F.col("value")
    norm = (
        F.when(
            F.col("name").isin(num_names),
            F.coalesce(value.try_cast("double").cast("string"), value),
        )
        .when(
            F.col("name").isin(int_names),
            F.coalesce(value.try_cast("bigint").cast("string"), value),
        )
        .otherwise(value)
    )
    return selected.withColumn("value", norm)


def construct_table_with_errors(
    facts: DataFrame,
    spec: TableSpec,
    typed_dates: bool = False,
    deterministic_order: bool = False,
    skew_safe: bool = False,
    input_clustered: bool = False,
) -> TableResult:
    """Build one output table from the (denormalized) long facts relation.

    Args:
        facts: output of ``sources.shredder.facts_from``.
        spec: the table's schema contract.
        typed_dates: cast date PK columns to DateType (Spark-native surface)
            instead of the reference's ISO strings.
        deterministic_order: end with orderBy(PK) — needed only for golden
            comparisons / single-file sinks; a cluster sink should stay
            unordered and let the writer bucket it.
        skew_safe: hot-key fallback (the G13 two-phase shape). The default
            single-exchange plan ships RAW rows through one
            repartition(filing_name, c_id); a pathological key (one filing
            or one context owning most of the rows) then funnels into one
            task. With ``skew_safe`` the explicit repartition is dropped
            and each aggregate owns its exchange, so Catalyst plans a
            partial aggregate BEFORE the shuffle: hot-key rows are
            pre-combined on every map task (the salt is the input
            partitioning itself) and the shuffle carries one partial row
            per (map task × key). Costs a second exchange (fuzzy on the
            fact key, pivot on the context key) — worth it exactly when a
            key is hot; output is identical (pinned by
            tests/test_fact_table.py::test_skew_safe_mode_equivalence).
        input_clustered: the caller guarantees ``facts`` is already
            hash-clustered on (filing_name, c_id) — e.g. loaded from a
            bucketed table, or repartitioned BEFORE a row-multiplying
            transform so the exchange shipped fewer/wider rows. Skips the
            explicit repartition; every aggregate's required distribution
            is satisfied by the input partitioning, so the whole table
            plan runs with ZERO exchanges.
    """
    fact_key = ["filing_name", "c_id", "name"]

    selected = filters.with_concepts(
        filters.for_period(facts, spec.instant), spec.data_columns
    )
    selected = filters.dims_fit_table(selected, spec.axes)
    selected = _normalize_values(selected, spec)

    # Shrink the shuffle payload map-side BEFORE the exchange: resolve the
    # dims map into the table's axis string columns (P7 backfill) and keep
    # only the columns the rest of the plan reads. Shipping the map through
    # the shuffle measures ~4× slower than shipping flat strings.
    if spec.instant:
        date_cols = [F.col("end_date").alias("date")]
    else:
        date_cols = [F.col("start_date"), F.col("end_date")]
    selected = selected.select(
        "filing_name",
        "c_id",
        "entity_id",
        "publication_time",
        *date_cols,
        *[filters.axis_with_total("dims", axis) for axis in spec.axes],
        "name",
        "value",
    )

    # The single shuffle: every grouping key below is a superset of
    # (filing_name, c_id), so this one clustering serves them all. In
    # skew_safe mode the aggregates own their exchanges instead (partial
    # aggregation before each shuffle — see docstring).
    if not (skew_safe or input_clustered):
        selected = selected.repartition(F.col("filing_name"), F.col("c_id"))

    # A2+A3 in ONE aggregate: fuzzy_dedup is multiplicity-insensitive
    # (per-bucket min==max distinctness), so exact duplicates collapse
    # inside the same pass that resolves precision conflicts — no separate
    # dropDuplicates aggregate over the full relation (measured ~1.4s of
    # the sf0.1 pipeline). Precision resolution only for columns whose
    # declared type is numeric.
    numeric_names = [
        c for c, t in spec.columns.items() if t in NUMBER_TYPES | INTEGER_TYPES
    ]
    dedup = fuzzy_dedup(
        selected,
        fact_key,
        numeric_predicate=F.col("name").isin(numeric_names),
    )
    resolved = dedup.resolved

    # A1: long -> wide, grouped on (filing, c_id) exactly like the
    # reference's unstack-on-c_id (datapackage.py:427-441) — context PK
    # fields are functions of the context, so first() is constant per
    # group, and max(CASE WHEN name=c) sees at most one non-null value per
    # group post-fuzzy (deterministic). Narrow grouping key = reuses the
    # pipeline's one clustering, no extra sort columns.
    #
    # The per-column expressions are built as SQL TEXT, one F.expr per
    # aggregate column and ONE selectExpr for the cast/reindex projection:
    # the Column-API form (max(when(..)).alias(..) etc.) cost ~6 py4j
    # round-trips per data column — ~2,400 driver⇄JVM socket crossings
    # (~1.1s, cProfile'd in r10) to CONSTRUCT a 255-column table plan.
    # The parsed expression trees are identical (same plan, pinned by
    # tests/test_plans.py), only the construction path changes.
    keyed = resolved
    pk_cols = [c for c in keyed.columns if c not in ("filing_name", "c_id", "name", "value")]
    wide = keyed.groupBy("filing_name", "c_id").agg(
        *[F.expr(f"first({_bq(c)}) AS {_bq(c)}") for c in pk_cols],
        F.expr(
            "map_from_entries(collect_list(struct(name, value))) AS __m"
        ),
    ).selectExpr(
        "filing_name",
        "c_id",
        *[_bq(c) for c in pk_cols],
        *[f"__m['{_sq(c)}'] AS {_bq(c)}" for c in spec.data_columns],
    )

    # F9 casts + P5 reindex to the declared column order (one selectExpr).
    out_exprs = []
    for pk in spec.primary_key:
        if typed_dates and pk in ("date", "start_date", "end_date"):
            out_exprs.append(f"CAST({_bq(pk)} AS DATE) AS {_bq(pk)}")
        else:
            out_exprs.append(_bq(pk))
    for name in spec.data_columns:
        target = spark_type_for(spec.columns[name], typed_dates)
        out_exprs.append(
            f"TRY_CAST({_bq(name)} AS {target.simpleString()}) AS {_bq(name)}"
        )
    result = wide.selectExpr(*out_exprs)

    # P6: drop rows where every data column is null.
    result = filters.at_least_one_non_null(result, spec.data_columns)

    if deterministic_order:
        result = result.orderBy(*spec.primary_key)
    return TableResult(data=result, errors=dedup.errors)


def construct_table(
    facts: DataFrame,
    spec: TableSpec,
    typed_dates: bool = False,
    deterministic_order: bool = False,
    skew_safe: bool = False,
    input_clustered: bool = False,
) -> DataFrame:
    """Data-only convenience wrapper; use construct_table_with_errors (or
    pipeline.extract's errors/strict surface) to observe quarantined
    conflicts."""
    return construct_table_with_errors(
        facts,
        spec,
        typed_dates=typed_dates,
        deterministic_order=deterministic_order,
        skew_safe=skew_safe,
        input_clustered=input_clustered,
    ).data
