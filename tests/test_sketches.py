"""Mergeable-sketch corpus profiling: per-shard sketches must merge into
global estimates that track exact answers within each family's error
bound — computed WITHOUT rescanning data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.sketches import (
    cms_term_counts,
    merge_corpus_profile,
    shard_token_sketches,
    shared_distinct_tokens,
)
from market_data_ingestion_scraper_spark.operators.text import tokens
from market_data_ingestion_scraper_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents")


@pytest.fixture(scope="module")
def sketches(docs):
    return shard_token_sketches(docs).persist()


def test_merged_profile_tracks_exact(docs, sketches):
    prof = merge_corpus_profile(sketches)
    tok = docs.select(F.explode(tokens("text")).alias("t"))
    exact_instances = tok.count()
    exact_distinct = tok.distinct().count()
    assert prof["n_token_instances"] == exact_instances  # counters are exact
    for est in (prof["distinct_tokens_hll"], prof["distinct_tokens_theta"]):
        assert abs(est - exact_distinct) / exact_distinct < 0.05, (
            est, exact_distinct)
    # KLL quartiles: within rank tolerance of the exact quartiles
    lens = sorted(
        r["n"] for r in docs.select(F.size(tokens("text")).alias("n")).collect()
    )
    n = len(lens)
    for q, est in zip((0.25, 0.5, 0.75), prof["doc_len_quartiles"]):
        lo = lens[max(0, int((q - 0.05) * n))]
        hi = lens[min(n - 1, int((q + 0.05) * n))]
        assert lo <= est <= hi, (q, est, lo, hi)


def test_theta_intersection_estimates_shared_vocabulary(docs, sketches):
    shards = [r["shard"] for r in sketches.select("shard").collect()]
    a, b = sorted(shards)[:2]
    exact = (
        docs.filter(F.col("source") == a)
        .select(F.explode(tokens("text")).alias("t")).distinct()
        .intersect(
            docs.filter(F.col("source") == b)
            .select(F.explode(tokens("text")).alias("t")).distinct()
        )
        .count()
    )
    est = shared_distinct_tokens(sketches, a, b)
    assert abs(est - exact) / max(exact, 1) < 0.15, (est, exact)


def test_cms_point_queries_bounded_overestimate(docs, sketches):
    tok = docs.select(F.explode(tokens("text")).alias("t"))
    total = tok.count()
    exact = {
        r["t"]: r["n"]
        for r in tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n")).limit(5).collect()
    }
    got = cms_term_counts(sketches, list(exact))
    for term, true_n in exact.items():
        # CMS guarantee: never under, over by at most eps*N (whp; seeded)
        assert true_n <= got[term] <= true_n + int(0.001 * total) + 1, (
            term, got[term], true_n)


def test_sketches_are_small_and_per_shard(docs, sketches):
    rows = sketches.collect()
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        # each sketch is a bounded artifact, not a data copy
        assert len(bytes(r["hll_tokens"])) < 64 * 1024
        assert len(bytes(r["theta_tokens"])) < 64 * 1024
        assert len(bytes(r["kll_doc_len"])) < 64 * 1024


def test_shard_sketches_parquet_roundtrip_merges_identically(
    spark, sketches, tmp_path
):
    """The 'persisted alongside the data' claim, closed: shard sketch
    rows (binary HLL/theta/KLL/CMS columns) survive a parquet round-trip
    byte-for-byte — the reloaded artifacts merge to the same global
    profile and the same CMS point estimates as the in-memory rows, so
    yesterday's shard files really do serve tomorrow's global questions
    without a rescan."""
    path = str(tmp_path / "shard_sketches")
    sketches.write.parquet(path)
    reloaded = spark.read.parquet(path)
    a = merge_corpus_profile(sketches)
    b = merge_corpus_profile(reloaded)
    assert a["n_token_instances"] == b["n_token_instances"]
    assert a["distinct_tokens_hll"] == b["distinct_tokens_hll"]
    assert a["distinct_tokens_theta"] == b["distinct_tokens_theta"]
    # KLL pairwise merges are collect-order-sensitive (the reloaded frame
    # lists shards in file order, the original in computation order), so
    # quartile ESTIMATES may differ by a within-rank-error hair — which is
    # exactly why the gate query (sketch_profile_check) pins bracketed
    # booleans, not raw estimates.  Tolerance: ±5% in value.
    for qa, qb in zip(a["doc_len_quartiles"], b["doc_len_quartiles"]):
        assert abs(qa - qb) <= max(2, 0.05 * qa), (qa, qb)
    terms = ["the", "data", "of"]
    assert cms_term_counts(sketches, terms) == cms_term_counts(reloaded, terms)


def test_empty_token_shard_still_profiled(spark):
    """A shard whose docs tokenize to nothing (non-Latin text) must stay
    in the profile as 0 tokens / N docs, not vanish (inner-join bug)."""
    docs = spark.createDataFrame(
        [
            (1, "hello world tokens here", "latin"),
            (2, "你好世界", "cjk"),     # no [a-z0-9] runs
            (3, "!!! ??? ...", "cjk"),
        ],
        "doc_id long, text string, source string",
    )
    sk = shard_token_sketches(docs)
    rows = {r["shard"]: r for r in sk.collect()}
    assert set(rows) == {"latin", "cjk"}
    assert rows["cjk"]["n_token_instances"] == 0
    assert rows["cjk"]["kll_doc_len"] is not None  # doc lengths still sketched
    assert shared_distinct_tokens(sk, "latin", "cjk") == 0.0
    assert cms_term_counts(sk.filter(F.col("shard") == "cjk"), ["hello"]) == {
        "hello": 0
    }
