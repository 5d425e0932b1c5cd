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


def test_bloom_artifact_constant_size_and_probe_shard_bounded(
    spark, base_docs, scaled_docs
):
    """The bloom sidecar's 100 TB claim: the artifact is n_shards x
    n_bits/8 bytes at ANY corpus size, present hashes always hit, and a
    fixed probe shard's verdict count doesn't scale with the corpus."""
    from market_data_ingestion_scraper_spark.operators.bloom import (
        bloom_probe_hashes,
        build_hash_bloom,
    )

    def hashes(df):
        from market_data_ingestion_scraper_spark.jobs import _content_hash

        return df.select(_content_hash().alias("content_hash"))

    sizes = {}
    positives = {}
    probe = hashes(base_docs.filter(F.col("doc_id") < 50)).withColumnRenamed(
        "content_hash", "_h"
    )
    for name, df in (("base", base_docs), ("scaled", scaled_docs)):
        blooms = build_hash_bloom(
            hashes(df), n_shards=4, n_bits=1 << 14, n_hashes=5
        ).persist()
        sizes[name] = blooms.agg(F.sum(F.length("bitmap"))).collect()[0][0]
        positives[name] = (
            bloom_probe_hashes(probe, blooms)
            .where(F.col("bloom_maybe"))
            .count()
        )
        blooms.unpersist()
    assert sizes["base"] == sizes["scaled"] == 4 * (1 << 14) // 8
    n_probe = probe.distinct().count()
    # every present hash hits in both (no false negatives)
    assert positives["base"] == positives["scaled"] == n_probe


def test_lloyd_refine_output_bounded_by_k_times_dim(spark, scaled_docs):
    """One Lloyd step's output is k x dim rows regardless of corpus
    size — the reduce that makes full-data refinement affordable."""
    from market_data_ingestion_scraper_spark.operators.scaling import (
        replicate_embeddings,
    )
    from market_data_ingestion_scraper_spark.operators.similarity import (
        refined_centroid_elements,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    dim = len(emb.first()["embedding"])
    cents = [[0.1 * (c + 1)] * dim for c in range(4)]
    base_rows = refined_centroid_elements(emb, cents)
    scaled_rows = refined_centroid_elements(
        replicate_embeddings(emb, K), cents
    )
    assert base_rows.count() <= 4 * dim
    assert scaled_rows.count() <= 4 * dim
    # replicas reuse base vectors, so per-cell counts scale by exactly K
    b = {(r["cell"], r["pos"]): r["n_vecs"] for r in base_rows.collect()}
    s = {(r["cell"], r["pos"]): r["n_vecs"] for r in scaled_rows.collect()}
    assert s == {k2: K * v for k2, v in b.items()}


def test_linkage_cap_bounds_replicated_blocks(spark, sf_smoke):
    """X18 scale guard: replicating the part table K× keeps the (brand,
    size) blocking-key cardinality FIXED, so uncapped pair fan-out grows
    ~K² — and the max_block guard must hold capped output at the 1×
    level once blocks exceed the cap (corpus-independent bound)."""
    from market_data_ingestion_scraper_spark.operators.linkage import (
        linked_record_pairs,
    )
    from market_data_ingestion_scraper_spark.sources.tables import load_table

    part = load_table(spark, sf_smoke, "part")
    base_max = (
        part.groupBy("p_brand", "p_size").count().agg(F.max("count"))
    ).collect()[0][0]
    k = 3
    rep = (
        part.crossJoin(spark.range(k).select(F.col("id").alias("_r")))
        .select(
            (F.col("p_partkey") + F.col("_r") * 10_000_000).alias("p_partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        )
    )
    n1 = linked_record_pairs(part).count()
    nk = linked_record_pairs(rep).count()
    # every base block of size n becomes size k·n: C(kn,2) ≥ k²·C(n,2),
    # so uncapped growth must exceed k× (the quadratic regime, measured)
    assert nk > k * n1
    # the cap restores a corpus-independent bound: every replicated
    # block exceeds base_max ⇒ capped pairs can only come from blocks
    # that stayed small enough — with cap < k·min-block-size, zero
    capped = linked_record_pairs(rep, max_block=base_max).count()
    uncapped_small = linked_record_pairs(part, max_block=base_max).count()
    assert capped <= uncapped_small * k * k
    assert capped < nk  # the guard actually bit
