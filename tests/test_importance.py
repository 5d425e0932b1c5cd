"""X20 DSIR importance resampling: semantics pinned against an
independent pure-Python twin (hashed n-gram models, micro-unit log
arithmetic, seeded Gumbel top-k), plus directional/determinism/plan
properties the fixed oracle dataset cannot express."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.dedup import HASH_P
from market_data_ingestion_scraper_spark.operators.importance import (
    dsir_select,
    hashed_ngram_buckets,
    importance_weights,
)

DOC_SCHEMA = "doc_id long, text string"

TARGET = [
    (100, "spark shuffle partition join broadcast join"),
    (101, "partition pruning and broadcast join in spark"),
    (102, "shuffle partition sizing for the join planner"),
]

POOL = [
    (1, "spark shuffle join broadcast partition pruning"),  # target-like
    (2, "banana smoothie recipe with oat milk"),  # off-target
    (3, "the join planner picks a broadcast when the partition is small"),
    (4, "medieval falconry and the art of hawk training"),
    (5, "shuffle"),  # single token: unigram feature only
    (6, "spark spark spark shuffle shuffle join"),  # repeated target terms
    (7, ""),  # empty: no features, no row
    (8, None),  # null: no features, no row
]

B = 64
ALPHA = 1.0


def _rnd(x: float) -> int:
    """Half-away-from-zero to the nearest integer (Spark ROUND / DuckDB
    ROUND semantics, NOT Python's banker's rounding)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % HASH_P


def _feats(text):
    import re

    if text is None:
        return []
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_counts(rows):
    out = {}
    for doc_id, text in rows:
        for f in _feats(text):
            b = _phash(f) % B
            out[(doc_id, b)] = out.get((doc_id, b), 0) + 1
    return out


def _fit(per_doc):
    agg = {}
    for (_, b), c in per_doc.items():
        agg[b] = agg.get(b, 0) + c
    tot = sum(agg.values())
    denom = tot + ALPHA * B
    model = {b: _rnd(math.log((c + ALPHA) / denom) * 1e6) for b, c in agg.items()}
    floor = _rnd(math.log(ALPHA / denom) * 1e6)
    return model, floor


def _py_weights(pool_rows, target_rows):
    pool_counts = _bucket_counts(pool_rows)
    tgt_model, tgt_floor = _fit(_bucket_counts(target_rows))
    raw_model, raw_floor = _fit(pool_counts)
    out = {}
    for (doc_id, b), c in pool_counts.items():
        lpt = tgt_model.get(b, tgt_floor)
        lpr = raw_model.get(b, raw_floor)
        nf, lw = out.get(doc_id, (0, 0))
        out[doc_id] = (nf + c, lw + c * (lpt - lpr))
    return out


def _py_select(pool_rows, target_rows, k, seed="dsir"):
    w = _py_weights(pool_rows, target_rows)
    keyed = []
    for doc_id, (nf, lw) in w.items():
        h = _phash(f"{seed}:{doc_id}")
        u = (h + 1) / (HASH_P + 1)
        g = _rnd(-math.log(-math.log(u)) * 1e6)
        keyed.append((doc_id, nf, lw, lw + g))
    keyed.sort(key=lambda r: (-r[3], r[0]))
    return keyed[:k]


def test_bucket_counts_match_python_twin(spark):
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_buckets(pool, B, portable=True).collect()
    }
    assert got == _bucket_counts(POOL)


def test_importance_weights_match_python_twin(spark):
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    got = {
        r["doc_id"]: (r["n_feats"], r["lw_micro"])
        for r in importance_weights(pool, tgt, B, ALPHA, portable=True).collect()
    }
    assert got == _py_weights(POOL, TARGET)
    # empty/null text docs carry no evidence and produce no row
    assert 7 not in got and 8 not in got


def test_target_like_outranks_off_target(spark):
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    w = {
        r["doc_id"]: r["logratio"]
        for r in importance_weights(pool, tgt, B, ALPHA, portable=True).collect()
    }
    # the doc built from target vocabulary (incl. target-seen bigrams)
    # beats the off-target ones by orders of magnitude
    assert w[1] > max(w[2], w[4]) + 3.0
    # degenerate repetition ("spark spark spark ...") is penalized even
    # though every unigram is on-target: its repeated bigrams never occur
    # in the target, so they hit the smoothing floor
    assert w[6] < w[1] - 3.0


def test_dsir_select_matches_python_topk(spark):
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    got = dsir_select(pool, tgt, 3, B, ALPHA, portable=True).collect()
    exp = _py_select(POOL, TARGET, 3)
    assert [r["doc_id"] for r in got] == [e[0] for e in exp]
    for r, (doc_id, nf, lw, key) in zip(got, exp):
        assert r["n_feats"] == nf
        assert r["logratio"] == round(lw / 1e6, 6)
        assert r["key"] == round(key / 1e6, 6)


def test_select_deterministic_across_partitioning(spark):
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    a = dsir_select(pool, tgt, 4, B, ALPHA, portable=True).collect()
    b = dsir_select(
        pool.repartition(7), tgt.repartition(3), 4, B, ALPHA, portable=True
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_temperature_flattens_weight_dominance(spark):
    """At a huge temperature the weight term vanishes and ordering is the
    (seeded, deterministic) Gumbel noise alone — exercised via the
    scaled-integer path (temperature != 1)."""
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    got = dsir_select(
        pool, tgt, 6, B, ALPHA, temperature=1e12, portable=True
    ).collect()
    w = _py_weights(POOL, TARGET)
    exp = []
    for doc_id in w:
        h = _phash(f"dsir:{doc_id}")
        u = (h + 1) / (HASH_P + 1)
        exp.append((doc_id, _rnd(-math.log(-math.log(u)) * 1e6)))
    exp.sort(key=lambda r: (-r[1], r[0]))
    assert [r["doc_id"] for r in got] == [e[0] for e in exp]


def test_select_plan_is_topk_with_broadcast_models(spark):
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    plan = (
        dsir_select(pool, tgt, 3, B, ALPHA, portable=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "BroadcastHashJoin" in plan  # model tables broadcast
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # corpus never shuffles against a model


# -------------------------------------------------------------- model lifecycle

def test_literal_model_scoring_matches_relational(spark):
    """The plan-literal delta-map serving path is bit-equal to the
    relational fit+score (importance_weights) on the model's own pool."""
    from market_data_ingestion_scraper_spark.operators.importance import (
        fit_dsir_model,
        score_with_literal_model,
    )

    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    model = fit_dsir_model(pool, tgt, B, ALPHA, portable=True)
    rel = {
        r["doc_id"]: (r["n_feats"], r["lw_micro"], r["logratio"])
        for r in importance_weights(pool, tgt, B, ALPHA, portable=True).collect()
    }
    lit = {
        r["doc_id"]: (r["n_feats"], r["lw_micro"], r["logratio"])
        for r in score_with_literal_model(pool, model).collect()
        if r["n_feats"] is not None
    }
    assert lit == rel
    # featureless docs score NULL through the literal path (policy: the
    # caller decides; the relational path emits no row at all)
    nulls = {
        r["doc_id"]
        for r in score_with_literal_model(pool, model).collect()
        if r["n_feats"] is None
    }
    assert nulls == {7, 8}


def test_dsir_model_artifact_round_trip(tmp_path, spark):
    from market_data_ingestion_scraper_spark.operators.importance import (
        fit_dsir_model,
        load_dsir_model,
        save_dsir_model,
        score_with_literal_model,
    )

    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    model = fit_dsir_model(pool, tgt, B, ALPHA, portable=True)
    path = str(tmp_path / "dsir.json")
    save_dsir_model(model, path, meta={"note": "test"})
    loaded = load_dsir_model(path)
    assert loaded["delta_micro"] == model["delta_micro"]
    assert loaded["n_buckets"] == B and loaded["portable"] is True
    a = score_with_literal_model(pool, model).collect()
    b = score_with_literal_model(pool, loaded).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # kind / shape validation refuses garbage
    import json

    import pytest as _pytest

    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump({"kind": "other"}, f)
    with _pytest.raises(ValueError, match="not a dsir"):
        load_dsir_model(bad)
    doc = dict(model)
    doc["delta_micro"] = {str(B + 5): 1}
    with open(bad, "w") as f:
        json.dump({**doc, "kind": "dsir-hashed-ngram"}, f)
    with _pytest.raises(ValueError, match="outside"):
        load_dsir_model(bad)


def test_importance_caches_are_generation_bounded(spark):
    """The DSIR featurization persists ride the shared generation
    registry: a repeat call replaces (not accumulates) its generation,
    and release_dedup_caches() frees them — the r9 leak discipline."""
    from market_data_ingestion_scraper_spark.operators.dedup import (
        _CACHE_GENERATIONS,
        release_dedup_caches,
    )
    from market_data_ingestion_scraper_spark.operators.importance import (
        fit_dsir_model,
    )

    release_dedup_caches()
    pool = spark.createDataFrame(POOL, DOC_SCHEMA)
    tgt = spark.createDataFrame(TARGET, DOC_SCHEMA)
    # single-plan scoring does NOT persist (measured slower at high
    # parallelism — see importance_weights); only the multi-action fit does
    importance_weights(pool, tgt, B, ALPHA, portable=True).collect()
    assert "dsir_pool_feats" not in _CACHE_GENERATIONS
    fit_dsir_model(pool, tgt, B, ALPHA, portable=True)
    assert len(_CACHE_GENERATIONS.get("dsir_fit_pool_feats", [])) == 1
    assert len(_CACHE_GENERATIONS.get("dsir_fit_tgt_feats", [])) == 1
    fit_dsir_model(pool, tgt, B, ALPHA, portable=True)
    assert len(_CACHE_GENERATIONS.get("dsir_fit_pool_feats", [])) == 1
    release_dedup_caches()
    assert "dsir_fit_pool_feats" not in _CACHE_GENERATIONS
    assert "dsir_fit_tgt_feats" not in _CACHE_GENERATIONS
