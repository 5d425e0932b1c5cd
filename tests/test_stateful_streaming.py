"""Custom stateful operator test: purchase-terminated sessions via
applyInPandasWithState, driven through a real streaming query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.sources import load_table
from market_data_ingestion_scraper_spark.streaming import pipeline as P
from market_data_ingestion_scraper_spark.streaming.stateful import purchase_sessions


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    d = tmp_path_factory.mktemp("stateful_stream")
    load_table(spark, sf_smoke, "events").repartition(2).write.mode("overwrite").parquet(
        str(d / "in")
    )
    return str(d / "in")


def test_purchase_sessions_stream(spark, sf_smoke, events_dir):
    ev = P.stream_events(spark, events_dir)
    q = (
        purchase_sessions(ev)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table("t_sessions").collect()
    assert len(out) > 0
    # every emitted purchase-ended session is consistent
    for r in out:
        assert r["ended_by"] == "purchase"  # timeouts need wall-clock passage
        assert r["session_end_ms"] >= r["session_start_ms"]
        assert r["n_events"] >= 1

    # cross-check: total purchase events == total purchase-ended sessions
    n_purchases = (
        load_table(spark, sf_smoke, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(out) == n_purchases
