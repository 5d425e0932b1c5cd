"""As-of and interval join unit tests on hand-built data with known answers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.asof import asof_join, interval_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 20, _ts(9)), (4, 30, _ts(4))],
        "id long, key long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(2), 100.0), (10, _ts(5), 200.0), (20, _ts(9), 300.0)],
        "key long, ts timestamp, v double",
    )
    out = {r["id"]: r["asof_v"] for r in
           asof_join(left, right, "ts", "key", ("v",)).collect()}
    assert out[1] == 200.0   # equal timestamp matches (inclusive)
    assert out[2] is None    # before any right row
    assert out[3] == 300.0   # exact-time match for other key
    assert out[4] is None    # key with no right rows at all


def test_asof_join_carries_latest_not_any(spark):
    left = spark.createDataFrame([(1, 7, _ts(30))], "id long, key long, ts timestamp")
    right = spark.createDataFrame(
        [(7, _ts(m), float(m)) for m in (1, 5, 20, 29)] + [(7, _ts(45), 99.0)],
        "key long, ts timestamp, v double",
    )
    row = asof_join(left, right, "ts", "key", ("v",)).collect()[0]
    assert row["asof_v"] == 29.0  # latest ≤ t, not the later one


def test_interval_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0), (5, 99.0)],
        "id long, x double",
    )
    ivs = spark.createDataFrame(
        [(0.0, 10.0, "lo"), (10.0, 50.0, "mid"), (40.0, 100.0, "hi")],
        "lo double, hi double, label string",
    )
    got = {(r["id"], r["label"]) for r in
           interval_join(pts, ivs, "x", "lo", "hi", bucket_width=7.0).collect()}
    assert got == {
        (1, "lo"), (2, "lo"),          # [0,10): 0.0 in, 9.999 in
        (3, "mid"), (4, "mid"),        # 10.0 excluded from 'lo', included in 'mid'
        (5, "hi"),                     # overlapping intervals both honored
    }


def test_interval_join_overlapping_intervals(spark):
    pts = spark.createDataFrame([(1, 45.0)], "id long, x double")
    ivs = spark.createDataFrame(
        [(10.0, 50.0, "mid"), (40.0, 100.0, "hi")],
        "lo double, hi double, label string",
    )
    got = {r["label"] for r in
           interval_join(pts, ivs, "x", "lo", "hi", bucket_width=25.0).collect()}
    assert got == {"mid", "hi"}  # a point in two intervals matches both
