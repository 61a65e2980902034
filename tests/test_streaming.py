"""Streaming surface: the G8 window operators under readStream must match
their batch counterparts (same expressions, plus watermark)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.streaming import (
    run_stream_to_memory,
    stream_session_counts,
    stream_tumbling_counts,
)


@pytest.fixture()
def event_dir(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:05:00", "click"),
        (2, "2024-01-01 00:25:00", "click"),
        (3, "2024-01-01 01:10:00", "view"),
        (4, "2024-01-01 01:12:00", "view"),
        (5, "2024-01-01 03:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    path = str(tmp_path / "events")
    df.write.parquet(path)
    return path, df.schema


def test_stream_tumbling_matches_batch(spark, event_dir):
    path, schema = event_dir
    stream = spark.readStream.schema(schema).parquet(path)
    windowed = stream_tumbling_counts(stream, "ts", "1 hour", ["event_type"])
    # append mode only emits watermark-closed windows; the final window
    # stays open forever on a finite input -> use update mode for the test
    q = run_stream_to_memory(windowed, "tumbling_test", output_mode="update")
    q.processAllAvailable()
    q.stop()
    got = {
        (str(r["window_start"]), r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "click"): 2,
        ("2024-01-01 01:00:00", "view"): 2,
        ("2024-01-01 03:00:00", "click"): 1,
    }


def test_stream_sessions(spark, event_dir):
    path, schema = event_dir
    stream = spark.readStream.schema(schema).parquet(path)
    sessions = stream_session_counts(stream, "ts", "30 minutes", ["event_type"])
    # session windows support append (watermark-gated) or complete, not
    # update; complete emits all finalized-so-far sessions on a finite input
    q = run_stream_to_memory(sessions, "session_test", output_mode="complete")
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM session_test").collect()
    by_start = {(str(r["session_start"]), r["event_type"]): r["n"] for r in rows}
    # events 1+2 merge (20 min gap < 30); 3+4 merge; 5 alone
    assert by_start == {
        ("2024-01-01 00:05:00", "click"): 2,
        ("2024-01-01 01:10:00", "view"): 2,
        ("2024-01-01 03:00:00", "click"): 1,
    }
