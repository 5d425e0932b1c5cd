"""X17 graph centrality + sparse TF-IDF similarity: semantics pinned
against independent pure-Python twins (same integer arithmetic), plus
structural properties the oracle's fixed dataset cannot express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.graph import (
    TOTAL_MASS_M,
    pagerank,
    top_ranked,
)
from market_data_ingestion_scraper_spark.operators.text import (
    tfidf_cosine_pairs,
    tfidf_vectors_m,
)


def _py_pagerank(edges, n_iter, damping_pct=85):
    """Independent reference: dict-based exact-integer power iteration
    mirroring the documented semantics (mass 10¹², truncating integer
    division, no dangling redistribution)."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    unit = TOTAL_MASS_M // len(nodes)
    teleport = ((100 - damping_pct) * unit) // 100
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {n: unit for n in nodes}
    for _ in range(n_iter):
        incoming = {n: 0 for n in nodes}
        for u, v in edges:
            incoming[v] += r[u] // outdeg[u]
        r = {n: teleport + (damping_pct * incoming[n]) // 100 for n in nodes}
    return r


EDGES = [
    (1, 10), (2, 10), (3, 10),          # 10 is a hub sink
    (10, 20), (20, 1), (1, 2), (2, 3),  # a cycle feeding back
    (4, 20),
]


@pytest.mark.parametrize("n_iter", [0, 1, 3, 7])
def test_pagerank_matches_python_reference(spark, n_iter):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_m"]
        for r in pagerank(edges, n_iter=n_iter, checkpoint_every=3).collect()
    }
    assert got == _py_pagerank(EDGES, n_iter)


def test_pagerank_hub_dominates_and_mass_bounded(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_m"] for r in pagerank(edges, n_iter=5).collect()
    }
    # nodes with in-links outrank the in-degree-0 source, and the node
    # absorbing the hub's whole outflow outranks everything
    assert got[4] == min(got.values())
    assert got[20] == max(got.values())
    assert got[10] > got[3]                   # 3 weak in-links beat one
    assert sum(got.values()) <= TOTAL_MASS_M  # truncation only loses mass
    assert min(got.values()) > 0              # teleport floors every node


def test_pagerank_duplicate_edges_collapse(spark):
    """The edge list is a SET: re-delivered duplicate edges must not
    double a contribution."""
    dup = spark.createDataFrame(EDGES + EDGES[:3], "src long, dst long")
    uniq = spark.createDataFrame(EDGES, "src long, dst long")
    assert sorted(map(tuple, pagerank(dup, 3).collect())) == sorted(
        map(tuple, pagerank(uniq, 3).collect())
    )


def test_pagerank_rejects_bad_damping(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(edges, damping_pct=140)


def test_top_ranked_is_deterministic_prefix(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    ranks = pagerank(edges, n_iter=3)
    top2 = top_ranked(ranks, k=2).collect()
    full = sorted(
        ((r["node"], r["rank_m"]) for r in ranks.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r["node"], r["rank_m"], r["rnk"]) for r in top2] == [
        (full[0][0], full[0][1], 1),
        (full[1][0], full[1][1], 2),
    ]


DOCS = [
    (1, "apple banana cherry apple"),
    (2, "apple banana cherry apple"),        # exact bag duplicate of 1
    (3, "cherry banana apple apple extra"),  # same bag + one extra term
    (4, "entirely different words here"),
    (5, "the the the the"),                  # only a ubiquitous term
]


def _py_tfidf_pairs(docs, threshold, max_df):
    """Independent reference with the same milli-unit weighting."""
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    df = {}
    for d, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    vec = {}
    for d, ts in toks.items():
        v = {}
        for t in ts:
            if df[t] <= max_df:
                v[t] = v.get(t, 0) + 1
        # round-half-away-from-zero like Spark/DuckDB ROUND
        vec[d] = {
            t: tf * int(math.floor(1000.0 * math.log(n / df[t]) + 0.5))
            for t, tf in v.items()
        }
    out = {}
    ids = sorted(vec)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = set(vec[a]) & set(vec[b])
            if not shared:
                continue
            num = sum(vec[a][t] * vec[b][t] for t in shared)
            na = math.sqrt(sum(w * w for w in vec[a].values()))
            nb = math.sqrt(sum(w * w for w in vec[b].values()))
            cos = round(num / (na * nb), 6)
            if cos >= threshold:
                out[(a, b)] = cos
    return out


def test_tfidf_pairs_match_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(docs, threshold=0.1, max_df=4).collect()
    }
    assert got == _py_tfidf_pairs(DOCS, 0.1, 4)
    assert got[(1, 2)] == 1.0          # identical bags → exact cosine 1
    # near-identical bags score well clear of unrelated pairs (doc 3's
    # rare 'extra' term carries most idf weight, so not ≈1)
    assert got[(1, 3)] > 0.5
    assert all(4 not in p and 5 not in p for p in got)


def test_tfidf_max_df_prunes_vectors_and_pairs(spark):
    """A term in EVERY document exceeds the df ceiling: doc 5 (only that
    term) has no vector at all, and no pair forms through it."""
    docs = spark.createDataFrame(
        [(i, "common unique%d" % i) for i in range(1, 5)] + [(9, "common")],
        "doc_id long, text string",
    )
    vecs = tfidf_vectors_m(docs, max_df=3)
    assert vecs.filter(F.col("term") == "common").count() == 0
    assert vecs.filter(F.col("doc_id") == 9).count() == 0
    assert tfidf_cosine_pairs(docs, threshold=0.0, max_df=3).count() == 0
