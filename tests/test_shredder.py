"""Shredder semantics (reference tests/unit/instance_test.py analogues)."""

from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.sources.shredder import (
    contexts_from,
    facts_from,
    shred_one,
    shred_filings,
)


def test_shred_one_contexts(filing_bytes):
    contexts, facts = shred_one(filing_bytes)
    by_id = {c["c_id"]: c for c in contexts}
    assert set(by_id) == {"d1", "d2", "d3", "i1", "i2"}
    assert by_id["d1"]["instant"] is False
    assert by_id["d1"]["start_date"] == "2021-01-01"
    assert by_id["i1"]["instant"] is True
    assert by_id["i1"]["end_date"] == "2021-12-31"
    assert by_id["i1"]["start_date"] is None
    # typed + explicit dims, prefix-stripped + snakecased keys
    assert by_id["d3"]["dims"] == {
        "region_axis": "east",
        "fuel_type_axis": "ferc:Coal",
    }
    assert by_id["d2"]["dims"] == {"region_axis": "west"}
    assert by_id["d1"]["dims"] == {}
    assert by_id["d1"]["entity_id"] == "E77"


def test_shred_one_facts(filing_bytes):
    _, facts = shred_one(filing_bytes)
    names = {f["name"] for f in facts}
    # snakecased concept names; empty-valued fact dropped at parse (P1)
    assert "revenue_total" in names
    assert "empty_fact" not in names
    revs = sorted(
        (f["c_id"], f["value"]) for f in facts if f["name"] == "revenue_total"
    )
    assert revs == [
        ("d1", "1234.5"),
        ("d2", "200.25"),
        ("d2", "200.25"),  # duplicate retained at parse; dedup is downstream
        ("d3", "99"),
    ]


def test_shred_filings_dataframe(spark, filing_dir):
    from ferc_xbrl_extractor_spark.sources.filings import scan_filings

    filings = scan_filings(spark, filing_dir)
    shredded = shred_filings(filings).cache()
    facts = facts_from(shredded)
    contexts = contexts_from(shredded)

    assert contexts.count() == 5
    assert facts.count() == 10  # 10 non-empty fact elements; empty_fact dropped
    # facts carry denormalized context fields
    row = (
        facts.filter((F.col("name") == "revenue_total") & (F.col("c_id") == "d3"))
        .select("entity_id", "instant", "start_date", "end_date", "dims")
        .first()
    )
    assert row["entity_id"] == "E77"
    assert row["instant"] is False
    assert row["dims"]["fuel_type_axis"] == "ferc:Coal"
    # per-filing report_date attached to every row
    assert facts.select("report_date").distinct().first()[0] == "2021-04-18"
    assert facts.select("filing_name").distinct().first()[0] == "acme-2021"
    shredded.unpersist()
