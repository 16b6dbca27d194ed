"""Streaming adapters: windowed counts and stateful sessionization must run
as real streaming queries and agree with their batch equivalents."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    p = os.path.join(TESTDATA, "events.parquet")
    if not os.path.exists(p):
        pytest.skip("testdata unavailable")
    # streaming file sources need a directory
    d = tmp_path_factory.mktemp("events_dir")
    import shutil

    shutil.copy(p, d / "events.parquet")
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, events_path, tmp_path):
    from topicrawler_spark.streaming.analytics import windowed_event_counts

    batch = spark.read.parquet(events_path)
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
        for r in windowed_event_counts(batch).collect()
    }

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == expected


def test_sessionize_stream_runs(spark, events_path, tmp_path):
    from topicrawler_spark.streaming.analytics import sessionize_stream

    batch = spark.read.parquet(events_path)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions_stream").collect()
    assert len(rows) > 0
    users = {r["user_id"] for r in rows}
    n_users = batch.select("user_id").distinct().count()
    assert len(users) == n_users
    assert all(r["n_events"] >= 1 for r in rows)
