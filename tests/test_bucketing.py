"""Bucketing: the 100 TB strategy for the lineitem⋈orders fact-fact join
(SCALE.md "Joins").  Writing both tables bucketed on the join key makes the
join co-located — the plan must contain NO shuffle Exchange on either side.
This test proves the claim on real (small) data; the identical write/join
code is what a cluster deployment would run."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.plans import aqe_disabled, explain_str
from market_data_ingestion_scraper_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_smoke):
    # warehouse dir is a tmp path set at session build (conftest) —
    # spark.sql.warehouse.dir is static config
    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    yield spark.table("li_bucketed"), spark.table("orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, orders = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        with aqe_disabled(spark):
            joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
                "o_orderpriority"
            ).agg(F.count(F.lit(1)).alias("n"))
            txt = explain_str(joined, "formatted")
        # the join itself must not shuffle either side: the only Exchange
        # allowed is the aggregation's (on o_orderpriority)
        join_section = txt.split("HashAggregate")[0]
        assert not re.search(r"Exchange hashpartitioning\(\w*orderkey", txt), txt[:2000]
        assert "SortMergeJoin" in txt or "ShuffledHashJoin" in txt
        assert joined.count() > 0  # and it actually runs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_matches_unbucketed(spark, bucketed, sf_smoke):
    li, orders = bucketed
    a = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    b = (
        load_table(spark, sf_smoke, "lineitem")
        .join(load_table(spark, sf_smoke, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert a == b
