"""Small-file compaction (pipeline/maintenance.py)."""

from __future__ import annotations

import os

from pyspark.sql import Row

from ferc_xbrl_extractor_spark.pipeline.maintenance import (
    compact_partitions,
    partition_layouts,
)


def _write_fragmented(spark, table, n_rows, n_files, part):
    df = spark.createDataFrame(
        [Row(k=i, v=f"v{i}", part=part) for i in range(n_rows)]
    )
    df.repartition(n_files).write.mode("append").partitionBy("part").parquet(table)


def _files(table, part):
    d = os.path.join(table, f"part={part}")
    return sorted(
        (f, os.path.getmtime(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def test_compact_rewrites_only_degenerate_partitions(spark, tmp_path):
    table = str(tmp_path / "tbl")
    _write_fragmented(spark, table, n_rows=200, n_files=16, part="frag")
    _write_fragmented(spark, table, n_rows=50, n_files=1, part="ok")

    layouts = {p.value: p for p in partition_layouts(table, "part")}
    assert layouts["frag"].n_files == 16
    assert layouts["ok"].n_files == 1

    before_ok = _files(table, "ok")
    plan = compact_partitions(
        spark, table, "part", target_file_bytes=1 << 30, max_files_per_partition=4
    )
    assert plan == {"frag": 1}
    assert len(_files(table, "frag")) == 1
    # healthy partition's files are the same files, not rewritten
    assert _files(table, "ok") == before_ok
    # no rows lost or duplicated
    got = spark.read.parquet(table)
    assert got.filter("part = 'frag'").count() == 200
    assert got.filter("part = 'ok'").count() == 50
    assert got.filter("part = 'frag'").select("k").distinct().count() == 200


def test_compact_respects_byte_budget(spark, tmp_path):
    table = str(tmp_path / "tbl2")
    _write_fragmented(spark, table, n_rows=500, n_files=10, part="p")
    total = partition_layouts(table, "part")[0].total_bytes
    # budget of ~half the partition -> 2 output files
    plan = compact_partitions(
        spark, table, "part",
        target_file_bytes=max(1, total // 2),
        max_files_per_partition=1,
    )
    assert plan["p"] in (2, 3)  # ceil(total/budget); budget rounding tolerance
    assert len(_files(table, "p")) == plan["p"]


def test_compact_noop_on_healthy_table(spark, tmp_path):
    table = str(tmp_path / "tbl3")
    _write_fragmented(spark, table, n_rows=10, n_files=1, part="a")
    assert compact_partitions(spark, table, "part") == {}


def test_compact_handles_hive_escaped_partition_values(spark, tmp_path):
    """Partition values with special characters are %-escaped in dir
    names; the layout report must decode them so the pruned filter
    actually selects the partition's rows."""
    table = str(tmp_path / "tbl4")
    _write_fragmented(spark, table, n_rows=60, n_files=8, part="a b:c")
    layouts = partition_layouts(table, "part")
    assert layouts[0].value == "a b:c"
    plan = compact_partitions(
        spark, table, "part", target_file_bytes=1 << 30, max_files_per_partition=2
    )
    assert plan == {"a b:c": 1}
    got = spark.read.parquet(table)
    assert got.filter("part = 'a b:c'").count() == 60
    import os

    d = [e for e in os.listdir(table) if e.startswith("part=")][0]
    files = [f for f in os.listdir(os.path.join(table, d)) if f.endswith(".parquet")]
    assert len(files) == 1
