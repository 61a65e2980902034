"""End-to-end table materialization goldens (reference
tests/integration/datapackage_test.py:87-152 analogues)."""

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
