"""Curation-operator tests: near-dup clustering (connected components),
deterministic sampling, repetition scoring, PII scrubbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators import dedup as D
from market_data_ingestion_scraper_spark.operators import sampling as S
from market_data_ingestion_scraper_spark.operators import text as T
from market_data_ingestion_scraper_spark.sources import load_table


def test_near_dup_clusters_transitive(spark):
    # a~b and b~c but a,c share less: the component must still unite all 3
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps soundly near the warm fire in the old wooden house")
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base.replace("quick", "speedy")),
            (2, base.replace("quick", "speedy").replace("lazy", "idle")),
            (3, "entirely unrelated text about spark window aggregation "
                "semantics and watermark state cleanup in streaming jobs "
                "running forever on large clusters with many executors"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
           for r in D.near_duplicate_clusters(docs, 0.55).collect()}
    assert out[0] == (0, 3) and out[1] == (0, 3) and out[2] == (0, 3)
    assert 3 not in out  # singletons are not cluster members


def test_cluster_reps_cover_planted_fixture(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    clusters = D.near_duplicate_clusters(docs, 0.7)
    pairs = D.jaccard_similarity_join(docs, 0.7)
    n_members = clusters.count()
    n_pair_docs = (
        pairs.select(F.col("doc_a").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("d")))
        .distinct()
        .count()
    )
    assert n_members == n_pair_docs  # every paired doc lands in a cluster
    # representative is the min id of its cluster
    bad = clusters.filter(F.col("cluster_rep") > F.col("doc_id")).count()
    assert bad == 0


def test_sampling_is_partition_invariant(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = {r["doc_id"] for r in S.uniform_hash_sample(docs, 100_000).collect()}
    b = {r["doc_id"] for r in
         S.uniform_hash_sample(docs.repartition(13), 100_000).collect()}
    assert a == b and 0 < len(a) < docs.count()  # same rows, any layout

    sa = {(r["doc_id"], r["sample_rank"])
          for r in S.stratified_sample(docs, "lang", 5).collect()}
    sb = {(r["doc_id"], r["sample_rank"])
          for r in S.stratified_sample(docs.repartition(7), "lang", 5).collect()}
    assert sa == sb
    n_langs = docs.select("lang").distinct().count()
    assert len(sa) == 5 * n_langs  # exact quota per stratum


def test_uniform_sample_rate_bounds(spark, sf_smoke):
    import pytest

    docs = load_table(spark, sf_smoke, "documents")
    n = docs.count()
    # rate 1e6 keeps every non-null key (sentinel threshold 'g')
    assert S.uniform_hash_sample(docs, 1_000_000).count() == n
    assert S.uniform_hash_sample(docs, 0).count() == 0
    with pytest.raises(ValueError):
        S.uniform_hash_sample(docs, 1_000_001)
    with pytest.raises(ValueError):
        S.uniform_hash_sample(docs, -1)
    # NULL keys never sample — at ANY rate, including 1e6 (one code path;
    # previously the 1e6 short-circuit returned null-key rows that every
    # lower rate dropped)
    withnull = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id bigint"
    )
    assert S.uniform_hash_sample(withnull, 1_000_000).count() == 2
    kept_ids = {
        r["doc_id"] for r in S.uniform_hash_sample(withnull, 1_000_000).collect()
    }
    assert kept_ids == {1, 2}


def test_repetition_scores_edges(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),     # "a b c" style repeats
            (1, "one two three four"),    # all grams distinct
            (2, "x y"),                   # shorter than k
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.repetition_scores(docs).collect()}
    assert out[0]["repetition_ratio"] > 0.5
    assert out[1]["repetition_ratio"] == 0.0
    assert out[2]["n_grams"] == 0 and out[2]["repetition_ratio"] == 0.0


def test_scrub_pii_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [(0, "mail me at jane.doe+x@mail.example.org or call +1555-0100-789 now")],
        "doc_id long, text string",
    )
    row = T.scrub_pii(docs).collect()[0]
    assert row["n_emails"] == 1 and row["n_phones"] == 1
    assert "<EMAIL>" in row["scrubbed"] and "<PHONE>" in row["scrubbed"]
    assert "jane" not in row["scrubbed"] and "0100" not in row["scrubbed"]
