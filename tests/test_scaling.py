"""Scale-curve guards (SCALE.md): candidate/verified pair counts for the
near-dup family must grow ~linearly in corpus size.  Quadratic growth
means an operator degenerated into all-pairs behavior — the exact failure
mode banding/inverted-indexing exists to prevent at 100 TB.

The K× corpus comes from operators/scaling.replicate_corpus: replicas are
token-disjoint (content diversity scales with size), so

- NO output pair may span two replicas (cross terms are the quadratic
  ingredient; token-disjoint replicas make them impossible unless an
  operator ignores content),
- the exact set-similarity join must find precisely K× the base pairs
  (token remap is a bijection — Jaccard values are preserved exactly),
- hash-family counts (MinHash bands, SimHash chunks) are per-replica
  draws around the base count; a generous per-replica cap catches
  degeneration without flaking on draw variance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators import dedup as D
from market_data_ingestion_scraper_spark.operators.scaling import (
    ID_STRIDE,
    replicate_corpus,
)
from market_data_ingestion_scraper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
K = 3


@pytest.fixture(scope="module")
def base_docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def scaled_docs(spark, base_docs):
    return replicate_corpus(base_docs, K)


def _cross_replica(pairs) -> int:
    return pairs.filter(
        (F.col("doc_a") / ID_STRIDE).cast("long")
        != (F.col("doc_b") / ID_STRIDE).cast("long")
    ).count()


def test_replicate_corpus_shape(spark, base_docs, scaled_docs):
    n = base_docs.count()
    assert scaled_docs.count() == K * n
    assert scaled_docs.select("doc_id").distinct().count() == K * n
    # replica 0 is byte-identical to the base corpus
    r0 = scaled_docs.filter(F.col("doc_id") < ID_STRIDE)
    assert r0.exceptAll(base_docs).count() == 0


def test_ssjoin_pairs_exactly_linear(spark, base_docs, scaled_docs):
    base = D.jaccard_similarity_join(base_docs).count()
    scaled_pairs = D.jaccard_similarity_join(scaled_docs)
    assert base > 0  # fixture must contain near-dups or this test is vacuous
    assert _cross_replica(scaled_pairs) == 0
    # bijective token remap preserves every Jaccard value: exactly K× pairs
    assert scaled_pairs.count() == K * base


def test_minhash_candidates_linear(spark, base_docs, scaled_docs):
    base = D.lsh_candidate_pairs(base_docs, portable=True).count()
    scaled_pairs = D.lsh_candidate_pairs(scaled_docs, portable=True)
    n_scaled = scaled_pairs.count()
    assert _cross_replica(scaled_pairs) == 0
    # each replica draws fresh token hashes → per-replica counts vary
    # around the base; a 4×-per-replica cap catches degeneration (a
    # single shared bucket would emit ~K²·n²/2 pairs) without flaking
    assert n_scaled >= base  # replica 0 alone reproduces the base pairs
    assert n_scaled <= K * max(base, 1) * 4


def test_simhash_pairs_linear(spark, base_docs, scaled_docs):
    base = D.simhash_near_duplicates(base_docs, portable=True).count()
    scaled_pairs = D.simhash_near_duplicates(scaled_docs, portable=True)
    n_scaled = scaled_pairs.count()
    assert _cross_replica(scaled_pairs) == 0
    # near-boundary pairs (Hamming 4-5) flip per draw — cap generously
    assert n_scaled <= K * (max(base, 1) + 10) * 4


def test_duplicated_span_stats_replica_invariant(spark, base_docs, scaled_docs):
    """Token-disjoint replicas: span stats must be exactly the base stats
    repeated K times (token remap is a bijection preserving positions) —
    and never create cross-replica duplication.  Quadratic-degeneration
    guard for the positional gram table."""
    base = sorted(
        (r["doc_id"], r["n_tokens"], r["n_dup_grams"], r["n_spans"],
         r["max_span_tokens"])
        for r in D.duplicated_span_stats(base_docs, n=4).collect()
    )
    scaled = [
        (r["doc_id"] % ID_STRIDE, r["n_tokens"], r["n_dup_grams"], r["n_spans"],
         r["max_span_tokens"])
        for r in D.duplicated_span_stats(scaled_docs, n=4).collect()
    ]
    assert len(scaled) == K * len(base) and len(base) > 0
    assert sorted(set(scaled)) == [t for t in base]  # same per-replica values
    from collections import Counter
    assert all(c == K for c in Counter(scaled).values())
