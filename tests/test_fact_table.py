"""End-to-end table materialization goldens (reference
tests/integration/datapackage_test.py:87-152 analogues)."""

import pytest
from ferc_xbrl_extractor_spark.catalog.tablespec import TableSpec
from ferc_xbrl_extractor_spark.operators.fact_table import construct_table
from ferc_xbrl_extractor_spark.sources.filings import scan_filings
from ferc_xbrl_extractor_spark.sources.shredder import facts_from, shred_filings


def _facts(spark, filing_dir):
    return facts_from(shred_filings(scan_filings(spark, filing_dir)))


def test_duration_no_axes(spark, filing_dir):
    spec = TableSpec(
        name="summary_duration",
        period_type="duration",
        columns={"revenue_total": "number", "operator_name": "string"},
    )
    df = construct_table(_facts(spark, filing_dir), spec, deterministic_order=True)
    rows = df.collect()
    # d2/d3 have dims not in PK -> excluded (P4); only d1 fits
    assert len(rows) == 1
    r = rows[0]
    assert r["entity_id"] == "E77"
    assert r["filing_name"] == "acme-2021"
    assert r["start_date"] == "2021-01-01"
    assert r["end_date"] == "2021-12-31"
    assert r["revenue_total"] == 1234.5
    assert r["operator_name"] == "Acme Power"


def test_duration_with_axis_and_total_backfill(spark, filing_dir):
    spec = TableSpec(
        name="summary_by_region_duration",
        period_type="duration",
        columns={"revenue_total": "number", "operator_name": "string"},
        axes=["region_axis"],
    )
    df = construct_table(_facts(spark, filing_dir), spec, deterministic_order=True)
    rows = {r["region_axis"]: r for r in df.collect()}
    # d1 (no dims) fits and becomes the 'total' slice; d2 (region only)
    # fits; d3 has an extra axis -> excluded
    assert set(rows) == {"total", "west"}
    assert rows["total"]["revenue_total"] == 1234.5
    assert rows["west"]["revenue_total"] == 200.25  # exact dup collapsed
    assert rows["west"]["operator_name"] is None


def test_instant_with_fuzzy_dedup(spark, filing_dir):
    spec = TableSpec(
        name="plant_instant",
        period_type="instant",
        columns={"plant_count": "integer", "net_generation": "number"},
    )
    df = construct_table(_facts(spark, filing_dir), spec, deterministic_order=True)
    rows = df.collect()
    assert len(rows) == 1  # i2 has a dim -> excluded
    r = rows[0]
    assert r["date"] == "2021-12-31"
    assert r["plant_count"] == 12
    # fuzzy dedup picked the more precise 5000.55
    assert r["net_generation"] == 5000.55


def test_instant_with_axis(spark, filing_dir):
    spec = TableSpec(
        name="plant_by_region_instant",
        period_type="instant",
        columns={"plant_count": "integer"},
        axes=["region_axis"],
    )
    df = construct_table(_facts(spark, filing_dir), spec, deterministic_order=True)
    rows = {r["region_axis"]: r["plant_count"] for r in df.collect()}
    assert rows == {"total": 12, "west": 7}


def test_pk_columns_and_order(spark, filing_dir):
    spec = TableSpec(
        name="summary_duration",
        period_type="duration",
        columns={"revenue_total": "number"},
        axes=["region_axis"],
    )
    df = construct_table(_facts(spark, filing_dir), spec)
    assert df.columns == [
        "entity_id",
        "filing_name",
        "publication_time",
        "start_date",
        "end_date",
        "region_axis",
        "revenue_total",
    ]


@pytest.mark.slow
def test_skew_safe_mode_equivalence(spark):
    # G13-shaped hot-key fallback: one filing owns ~90% of rows (and one
    # context inside it is hot). skew_safe must produce identical output
    # via aggregate-owned exchanges with partial (map-side) aggregation
    # before the first shuffle — the mechanism that spreads hot-key work
    # across every map task instead of one reducer.
    from pyspark.sql import functions as F

    hot = spark.range(0, 9000).select(
        F.lit("filing-hot").alias("filing_name"),
        # one hot context gets a third of the hot filing's rows
        F.when(F.col("id") % 3 == 0, F.lit("ctx-hot"))
        .otherwise(F.concat(F.lit("c"), F.col("id"))).alias("c_id"),
        F.lit("e1").alias("entity_id"),
        F.lit(False).alias("instant"),
        F.lit("2021-01-01").alias("start_date"),
        F.lit("2021-12-31").alias("end_date"),
        F.create_map().cast("map<string,string>").alias("dims"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("publication_time"),
        F.lit("cost").alias("name"),
        (F.col("id") % 7).cast("string").alias("value"),
    )
    cold = spark.range(0, 1000).select(
        F.concat(F.lit("filing-"), F.col("id") % 10).alias("filing_name"),
        F.concat(F.lit("k"), F.col("id")).alias("c_id"),
        F.lit("e2").alias("entity_id"),
        F.lit(False).alias("instant"),
        F.lit("2021-01-01").alias("start_date"),
        F.lit("2021-12-31").alias("end_date"),
        F.create_map().cast("map<string,string>").alias("dims"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("publication_time"),
        F.lit("cost").alias("name"),
        (F.col("id") % 5).cast("string").alias("value"),
    )
    facts = hot.unionByName(cold)
    spec = TableSpec(
        name="t", period_type="duration", columns={"cost": "number"}, axes=[]
    )
    base = construct_table(facts, spec, deterministic_order=True)
    safe = construct_table(facts, spec, deterministic_order=True, skew_safe=True)
    assert base.collect() == safe.collect()

    plan = safe._jdf.queryExecution().executedPlan().toString()
    # aggregate-owned exchanges: partial aggregation appears before any
    # exchange (reading the plan bottom-up, the deepest agg is partial)
    assert "partial_" in plan
    assert "REPARTITION_BY_COL" not in plan
