"""Distributed Lloyd refinement (similarity.refine_centroids) and corpus
snapshot diff (operators/versioning.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.similarity import (
    refine_centroids,
    refined_centroid_elements,
)
from market_data_ingestion_scraper_spark.operators.versioning import (
    corpus_diff,
    corpus_diff_summary,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated 8-dim blobs, 60 vectors each, deterministic."""
    rng = np.random.default_rng(7)
    centers = np.array(
        [[5.0] + [0.0] * 7, [0.0] * 4 + [5.0] + [0.0] * 3, [-5.0] + [0.0] * 7]
    )
    rows = []
    for i in range(180):
        c = centers[i % 3]
        rows.append(
            (i, [float(round(v, 4)) for v in c + rng.normal(0, 0.5, 8)])
        )
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def _sse(df, cents):
    """Within-cluster sum of squares for an assignment to cents."""
    x = np.array(
        [list(map(float, r["embedding"])) for r in df.collect()], dtype=float
    )
    c = np.asarray(cents, dtype=float)
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return float(d2.min(axis=1).sum())


def test_refine_improves_bad_start_and_objective_monotone(spark, clustered):
    # a deliberately bad start: all three centroids near one blob
    start = [
        [4.0] + [0.0] * 7,
        [4.5] + [0.5] * 7,
        [5.5] + [-0.5] * 7,
    ]
    sse0 = _sse(clustered, start)
    c1 = refine_centroids(clustered, start, n_iter=1)
    sse1 = _sse(clustered, c1)
    c2 = refine_centroids(clustered, c1, n_iter=1)
    sse2 = _sse(clustered, c2)
    # Lloyd objective never increases (within rounding noise)
    assert sse1 <= sse0 + 1e-6 and sse2 <= sse1 + 1e-6
    # and a few full-data iterations actually find the far blobs
    c5 = refine_centroids(clustered, start, n_iter=5)
    assert _sse(clustered, c5) < 0.5 * sse0


def test_refine_empty_cell_keeps_previous_centroid(spark, clustered):
    # centroid 2 is absurdly far away: no member ever assigns to it
    start = [[5.0] + [0.0] * 7, [-5.0] + [0.0] * 7, [1000.0] * 8]
    out = refine_centroids(clustered, start, n_iter=1)
    assert out[2] == start[2]  # untouched, k preserved
    elems = refined_centroid_elements(clustered, start)
    assert elems.where(F.col("cell") == 2).count() == 0


def test_refined_elements_match_numpy_reference(spark, clustered):
    start = [[5.0] + [0.0] * 7, [0.0] * 4 + [5.0] + [0.0] * 3,
             [-5.0] + [0.0] * 7]
    got = {
        (r["cell"], r["pos"]): (r["n_vecs"], r["centroid_val"])
        for r in refined_centroid_elements(clustered, start).collect()
    }
    # independent reference: micro-unit assignment + exact means in numpy
    rows = clustered.collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    vm = np.round(x * 1e6).astype(np.int64)
    wm = np.round(np.asarray(start) * 1e6).astype(np.int64)
    score = (wm * wm).sum(axis=1)[None, :] - 2 * (vm @ wm.T)
    assign = score.argmin(axis=1)  # ties broken by lowest cell = argmin
    for cell in range(3):
        members = vm[assign == cell]
        for pos in range(8):
            n, v = got[(cell, pos)]
            assert n == len(members)
            assert v == round(members[:, pos].sum() / 1e6 / len(members), 6)


def test_refine_plan_broadcasts_weights_no_cartesian(spark, clustered):
    start = [[5.0] + [0.0] * 7, [-5.0] + [0.0] * 7]
    plan = (
        refined_centroid_elements(clustered, start)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan  # k x dim weights broadcast


# ------------------------------------------------------- snapshot diff


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, content_hash string")


def test_corpus_diff_statuses(spark):
    old = _docs(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = _docs(spark, [(2, "b"), (3, "C2"), (4, None), (5, "e")])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",  # NULL hash on both sides is null-safe-equal
        5: "added",
    }
    summary = {
        r["status"]: r["n_docs"]
        for r in corpus_diff_summary(corpus_diff(old, new)).collect()
    }
    assert summary == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_corpus_diff_null_transitions_are_changed(spark):
    old = _docs(spark, [(1, "a"), (2, None)])
    new = _docs(spark, [(1, None), (2, "b")])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_corpus_diff_is_hash_only_scan(spark, sf_smoke):
    # column pruning: the diff over real parquet reads id + text (to
    # hash) but the diff FRAME itself never carries text columns
    from market_data_ingestion_scraper_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").withColumn(
        "content_hash", F.sha2(F.col("text"), 256)
    )
    d = corpus_diff(docs.limit(50), docs.limit(60))
    assert set(d.columns) == {"doc_id", "status", "old_hash", "new_hash"}
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
