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


def test_stream_weighted_reservoir_exact_parity(spark, sf_smoke, tmp_path):
    """§2.10 custom state × X23: shard reservoirs stream out admitted
    candidates across several micro-batches; finalize over the candidate
    stream must equal the BATCH weighted reservoir on the same corpus
    bit-for-bit, and the candidate volume must stay a small fraction of
    the input."""
    from market_data_ingestion_scraper_spark.operators.sampling import (
        weighted_reservoir_sample,
    )
    from market_data_ingestion_scraper_spark.streaming.stateful import (
        finalize_reservoir,
        stream_weighted_reservoir,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "n_chars")
    d = str(tmp_path / "docs_in")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    docs.repartition(5).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_weighted_reservoir(stream, n=12, n_shards=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_wrs")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    candidates = spark.table("t_wrs")
    n_cand = candidates.count()
    n_docs = docs.count()
    assert n_cand < n_docs  # admission actually filters
    # at most n per shard per batch would be 12*4*5; the reservoir bound
    # keeps it far under the input
    got = [
        (r["doc_id"], r["weight"], r["key_nano"])
        for r in finalize_reservoir(candidates, 12).collect()
    ]
    want = [
        (r["doc_id"], r["weight"], r["key_nano"])
        for r in weighted_reservoir_sample(docs, n=12).collect()
    ]
    assert sorted(got) == sorted(want)
    # candidates are a superset of the final sample
    cand_ids = {r["doc_id"] for r in candidates.collect()}
    assert {g[0] for g in got} <= cand_ids
