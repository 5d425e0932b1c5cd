"""Tests for the end-to-end ingestion job (main() analog), observe-based
metrics, and skew utilities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark import jobs
from market_data_ingestion_scraper_spark.operators import metrics as M
from market_data_ingestion_scraper_spark.operators import skew as K
from market_data_ingestion_scraper_spark.sources import load_table

APPLES = """commodity_raw,container,price,qty_sold,total_value
Apples,10kg box,12.50,100,1250.00
Apples,5kg bag,7.25,40,290.00
TOTAL,,19.75,140,1540.00
"""

PEARS = """commodity_raw,container,price,qty_sold,total_value
Pears,crate,30.00,10,300.00
"""


@pytest.fixture()
def raw_paths(tmp_path):
    a = tmp_path / "apples.csv"
    a.write_text(APPLES)
    p = tmp_path / "pears.csv"
    p.write_text(PEARS)
    return {"Apples (Golden)": str(a), "Pears": str(p)}


def test_run_market_ingestion_end_to_end(spark, raw_paths, tmp_path):
    lake = str(tmp_path / "lake")
    metrics = jobs.run_market_ingestion(
        spark, raw_paths, lake, scrape_date="2026-08-13", run_id="r1"
    )
    # apples is multi-container → all 3 link types; pears single → summary only
    assert set(metrics) == {
        "apples_golden/summary", "apples_golden/container", "apples_golden/variety",
        "pears/summary",
    }
    assert metrics["apples_golden/summary"] == (2, 2)  # total row dropped pre-write
    report = jobs.daily_report(spark, lake).collect()
    by_c = {r["commodity"]: r for r in report}
    assert by_c["apples_golden"]["total_qty"] == 140.0
    assert by_c["pears"]["total_revenue"] == 300.0

    # resume: everything completed → no units re-processed
    again = jobs.run_market_ingestion(
        spark, raw_paths, lake, scrape_date="2026-08-13", run_id="r2"
    )
    assert again == {}


def test_observed_count_rides_action(spark, sf_smoke):
    df, obs = M.observed_count(load_table(spark, sf_smoke, "part"))
    df.write.mode("overwrite").format("noop").save()
    assert obs.get["n_rows"] == 200


def test_salted_group_sum_matches_plain(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    plain = {
        r["l_returnflag"]: r["s"]
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: r["s"]
        for r in K.salted_group_sum(li, "l_returnflag", "l_quantity", "s").collect()
    }
    assert salted == plain  # bit-identical: decimal partials are exact


def test_grouped_pandas_udaf_matches_builtin(spark, sf_smoke):
    """applyInPandas weighted-average equals the built-in expression within
    float tolerance (pandas sums in arrival order; exactness is the decimal
    path's job — this is the escape-hatch API)."""
    from market_data_ingestion_scraper_spark.queries import REGISTRY

    got = {
        r["p_brand"]: r["weighted_avg_price"]
        for r in REGISTRY["grouped_pandas_price_stats"].fn(spark, sf_smoke).collect()
    }
    li = load_table(spark, sf_smoke, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf_smoke, "part")
    want = {
        r["p_brand"]: r["w"]
        for r in li.join(F.broadcast(part), "p_partkey")
        .groupBy("p_brand")
        .agg(
            (F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity")).alias("w")
        )
        .collect()
    }
    assert set(got) == set(want)
    for b in got:
        assert abs(got[b] - want[b]) < 1e-6 * max(1.0, abs(want[b]))


def test_salted_broadcast_left_matches_plain(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf_smoke, "part")
    plain = li.join(F.broadcast(part), "p_partkey").count()
    salted = K.salted_broadcast_left(li, part, "p_partkey").count()
    assert salted == plain


def test_run_training_data_build_end_to_end(spark, tmp_path):
    """The engine end-to-end (quality gate -> exact dedup ->
    contamination-safe split -> example construction): funnel counters
    reconcile exactly with the gated per-stage operators, eval text
    NEVER reaches a training example (the leakage contract), and a
    re-run writes byte-identical outputs (every stage is a pure
    function of content and ids)."""
    import glob
    import os

    from market_data_ingestion_scraper_spark.jobs import (
        run_training_data_build,
    )
    from market_data_ingestion_scraper_spark.sources.tables import load_table

    docs_path = str(tmp_path / "docs_in")
    load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source"
    ).write.parquet(docs_path)
    out1 = str(tmp_path / "build1")
    c = run_training_data_build(spark, docs_path, out1, write_sidecars=True)

    assert c["n_input"] == 500
    assert 0 < c["n_quality_kept"] <= c["n_input"]
    assert 0 < c["n_deduped"] <= c["n_quality_kept"]
    assert c["n_train"] + c["n_eval"] + c["n_quarantine"] == c["n_deduped"]
    # X34 span corruption emits exactly one example per train document;
    # FIM skips docs under 3 tokens; instruction pairs are bounded by
    # non-overlapping pairing
    assert c["n_span_examples"] == c["n_train"]
    assert c["n_fim_examples"] <= c["n_train"]
    assert 0 < c["n_instruct_examples"] <= c["n_train"] // 2 + 1

    # stage reconciliation: the written assignment equals the gated
    # operator run independently over the same deduped corpus
    from market_data_ingestion_scraper_spark.operators.dedup import (
        content_hash_dedup,
    )
    from market_data_ingestion_scraper_spark.operators.ensemble import (
        quality_ensemble,
    )
    from market_data_ingestion_scraper_spark.operators.splits import (
        decontaminated_holdout,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(docs_path)
    kept = quality_ensemble(docs).where(F.col("keep")).select("doc_id")
    gated = docs.join(kept, "doc_id", "left_semi")
    from market_data_ingestion_scraper_spark.jobs import _content_hash

    groups = content_hash_dedup(gated.withColumn("content_hash", _content_hash()))
    deduped = gated.join(
        groups.select(F.col("keep_doc_id").alias("doc_id")), "doc_id",
        "left_semi",
    )
    want = {
        tuple(r)
        for r in decontaminated_holdout(
            deduped.select("doc_id", "text")
        ).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out1, "split_assignment")).collect()
    }
    assert got == want

    # leakage contract: no eval doc id appears in ANY training example
    eval_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out1, "eval_docs")).collect()
    }
    span_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out1, "train_span")).collect()
    }
    pair_rows = spark.read.parquet(os.path.join(out1, "train_instruct")).collect()
    pair_ids = {r["prompt_doc_id"] for r in pair_rows} | {
        r["response_doc_id"] for r in pair_rows
    }
    assert not (eval_ids & span_ids) and not (eval_ids & pair_ids)

    # byte-identical re-run: same counters, same part-file bytes
    out2 = str(tmp_path / "build2")
    assert run_training_data_build(
        spark, docs_path, out2, write_sidecars=True
    ) == c
    for sub in ("eval_docs", "split_assignment", "train_span", "train_fim",
                "train_instruct"):
        p1 = sorted(glob.glob(os.path.join(out1, sub, "part-*")))
        p2 = sorted(glob.glob(os.path.join(out2, sub, "part-*")))
        assert len(p1) == len(p2) == 1, (sub, p1, p2)
        assert open(p1[0], "rb").read() == open(p2[0], "rb").read(), sub


def test_run_training_data_build_serve_handoff(spark, tmp_path):
    """write_sidecars=True closes the build -> serve loop: the job's
    bloom sidecars load with load_hash_bloom and stream_holdout_tag
    over them reproduces the job's own written split assignment (fp ~ 0
    at the auto-sized bit budget)."""
    import os

    from market_data_ingestion_scraper_spark.jobs import (
        run_training_data_build,
    )
    from market_data_ingestion_scraper_spark.operators.bloom import (
        load_hash_bloom,
    )
    from market_data_ingestion_scraper_spark.sources.tables import load_table
    from market_data_ingestion_scraper_spark.streaming.pipeline import (
        stream_holdout_tag,
    )

    docs_path = str(tmp_path / "docs_in")
    load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source"
    ).write.parquet(docs_path)
    out = str(tmp_path / "build")
    c = run_training_data_build(spark, docs_path, out, write_sidecars=True)
    assert c["n_train_grams"] > 0 and c["n_eval_grams"] >= 0
    tb, tside = load_hash_bloom(spark, os.path.join(out, "sidecar_train_grams"))
    eb, eside = load_hash_bloom(spark, os.path.join(out, "sidecar_eval_grams"))
    assert tside["hash_col"] == "gram_hash" and tside["k"] == 5

    # rebuild the deduped corpus the split was made over: the assignment
    # parquet carries exactly its doc_ids
    assignment = spark.read.parquet(os.path.join(out, "split_assignment"))
    corpus = (
        spark.read.parquet(docs_path)
        .join(assignment.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "text")
    )
    served = {
        r["doc_id"]: r["split"]
        for r in stream_holdout_tag(corpus, tb, eb).collect()
    }
    want = {r["doc_id"]: r["split"] for r in assignment.collect()}
    assert served == want
