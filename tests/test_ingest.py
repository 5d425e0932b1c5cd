"""Ingest-layer unit tests: raw→silver normalization, partitioned idempotent
sink, and resumable incremental-run semantics (SURVEY.md §2.9, §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators import ingest as I
from market_data_ingestion_scraper_spark.operators import state as S

RAW_CSV = """commodity_raw,container,price,qty_sold,total_value
  Apples (Golden) ,10kg box,12.50,100,1250.00
Apples (Golden),5kg bag,7.25,40,290.00
TOTAL,,19.75,140,1540.00
Monthly Summary,,,,,
"""


@pytest.fixture()
def raw_path(tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text(RAW_CSV)
    return str(p)


def test_normalize_trims_filters_casts_stamps(spark, raw_path):
    raw = I.read_raw_csv(spark, raw_path)
    out = I.normalize(
        raw, scrape_date="2026-08-13", commodity_raw_name="Apples (Golden)",
        link_type="summary", run_id="2026-08-13",
    )
    rows = out.orderBy("container").collect()
    # summary/total rows dropped (P3), data rows kept
    assert len(rows) == 2
    # trim applied (P2) and measures cast (Ext-F14)
    assert rows[0]["commodity_raw"] == "Apples (Golden)"
    assert rows[0]["price"] == 12.50 and rows[0]["qty_sold"] == 100.0
    # lineage stamped (L1) with sanitized commodity (F3: parens stripped,
    # space → underscore, lowercased)
    assert rows[0]["commodity"] == "apples_golden"
    assert rows[0]["link_type"] == "summary"
    assert rows[0]["scrape_date"] == "2026-08-13"
    assert rows[0]["ingestion_run_id"] == "2026-08-13"


def test_classify_table(spark, raw_path):
    raw = I.read_raw_csv(spark, raw_path)
    assert I.classify_table(raw) == "multi_container"
    single = raw.limit(1)
    assert I.classify_table(single) == "single_container"


def test_silver_write_idempotent(spark, raw_path, tmp_path):
    root = str(tmp_path / "lake")
    raw = I.read_raw_csv(spark, raw_path)
    silver = I.normalize(raw, "2026-08-13", "Apples (Golden)", "summary", "r1")
    I.write_silver(silver, root)
    first = sorted(map(tuple, I.read_silver(spark, root).collect()))

    # re-run same unit (L6): same partition overwritten, dataset unchanged
    I.write_silver(silver, root)
    second = sorted(map(tuple, I.read_silver(spark, root).collect()))
    assert first == second

    # a different unit lands in its own partition, sibling untouched
    other = I.normalize(raw, "2026-08-13", "Pears", "container", "r1")
    I.write_silver(other, root)
    all_rows = I.read_silver(spark, root)
    assert all_rows.filter(F.col("commodity") == "apples_golden").count() == 2
    assert all_rows.filter(F.col("commodity") == "pears").count() == 2


def test_incremental_resume_skips_done(spark, tmp_path):
    root = str(tmp_path / "lake")
    work = spark.createDataFrame(
        [("apples", "summary"), ("apples", "container"), ("pears", "summary")],
        "commodity string, link_type string",
    )
    done: list[tuple[str, str]] = []

    def process(c, lt, run_id):
        if (c, lt) == ("pears", "summary") and not crashed[0]:
            crashed[0] = True
            raise RuntimeError("simulated crash mid-unit")
        done.append((c, lt))

    crashed = [False]
    with pytest.raises(RuntimeError):
        S.run_incremental(spark, root, work, process, run_id="r1")
    # two units completed before the crash; the in-flight one is 'started'
    assert len(done) == 2
    status = S.read_status(spark, root)
    assert status.filter((F.col("commodity") == "pears") & (F.col("status") == "done")).count() == 0
    assert status.filter((F.col("commodity") == "pears") & (F.col("status") == "started")).count() == 1

    # resume (L3): only the in-flight unit is redone — completed are skipped
    redone = S.run_incremental(spark, root, work, process, run_id="r2")
    assert redone == [("pears", "summary")]
    assert len(done) == 3

    # second resume: nothing left
    assert S.run_incremental(spark, root, work, process, run_id="r3") == []


def test_fully_completed_commodities(spark, tmp_path):
    root = str(tmp_path / "lake")
    for lt in ("summary", "container"):
        S.record_status(spark, root, "apples", lt, "r1", "done")
    S.record_status(spark, root, "pears", "summary", "r1", "done")
    full = S.fully_completed_commodities(spark, root, ("summary", "container"))
    assert [r["commodity"] for r in full.collect()] == ["apples"]
