"""Linear quality classifier: exact distributed gradient step, driver
multi-step training, literal-weight serving (operators/classifier.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.classifier import (
    FEATURE_COLS,
    classifier_features,
    fit_lr,
    gradient_step_weights,
    logistic_loss,
    logit_scores,
    score_with_literal_weights,
)
from market_data_ingestion_scraper_spark.operators.text import (
    quality_features,
)


def _corpus(spark, n_clean=40, n_junk=40):
    """Deterministic planted corpus: clean English-ish prose vs
    punctuation-soaked junk — linearly separable on the staged
    features."""
    rows = []
    for i in range(n_clean):
        rows.append(
            (
                i,
                "the quick brown fox jumps over the lazy dog and it "
                "is a fine day in the meadow " * (3 + i % 3),
            )
        )
    for i in range(n_junk):
        rows.append((1000 + i, "@@!! ## $$%% ^^&&**(( ))__ ++==" * (2 + i % 4)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def feats(spark):
    return classifier_features(
        quality_features(_corpus(spark)), label_threshold=0.6
    ).persist()


def test_weak_labels_split_planted_corpus(feats):
    by_s = {r["s"]: r["n"] for r in feats.groupBy("s").count()
            .withColumnRenamed("count", "n").collect()}
    assert by_s.get(1, 0) >= 30 and by_s.get(-1, 0) >= 30


def test_gradient_step_matches_numpy(feats):
    w = gradient_step_weights(feats, lr=1.0).collect()[0]
    pdf = feats.toPandas()
    x = pdf[list(FEATURE_COLS)].to_numpy(dtype=np.float64)
    s = pdf["s"].to_numpy(dtype=np.float64)
    # same micro-unit staging as the operator: round features first
    xm = np.round(x * 1e6)
    expect = np.round(0.5 * (xm * s[:, None]).sum(axis=0) / 1e6 / len(s), 6)
    got = np.array([w[f"w_{c}"] for c in FEATURE_COLS])
    assert np.allclose(got, expect, atol=1e-9)


def test_one_step_scores_separate_planted_classes(feats):
    scored = logit_scores(feats, gradient_step_weights(feats, lr=1.0))
    joined = scored.join(feats.select("doc_id", "s"), "doc_id")
    wrong = joined.where(
        (F.col("s") == 1) != F.col("keep")
    ).count()
    # one exact gradient step already separates punctuation junk from prose
    assert wrong == 0


def test_fit_lr_loss_monotone_and_beats_one_step(feats):
    losses = [
        logistic_loss(feats, fit_lr(feats, n_iter=n, lr=1.0))
        for n in (1, 5, 25, 100)
    ]
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:])), losses
    w0 = [0.0] * len(FEATURE_COLS)
    assert losses[-1] < logistic_loss(feats, w0)


def test_fit_lr_deterministic(feats):
    assert fit_lr(feats, n_iter=20) == fit_lr(feats, n_iter=20)


def test_literal_serving_matches_frame_scoring(feats):
    wrow = gradient_step_weights(feats, lr=1.0).collect()[0]
    lits = [float(wrow[f"w_{c}"]) for c in FEATURE_COLS]
    via_frame = {
        r["doc_id"]: (r["logit"], r["keep"])
        for r in logit_scores(
            feats, gradient_step_weights(feats, lr=1.0)
        ).collect()
    }
    via_lits = {
        r["doc_id"]: (r["logit"], r["keep"])
        for r in score_with_literal_weights(feats, lits).collect()
    }
    assert via_frame == via_lits


def test_serving_weight_arity_checked(feats):
    with pytest.raises(ValueError):
        score_with_literal_weights(feats, [0.1, 0.2])


def test_scoring_plan_broadcasts_weights(feats):
    plan = logit_scores(
        feats, gradient_step_weights(feats, lr=1.0)
    )._jdf.queryExecution().executedPlan().toString()
    # 1-row weight side broadcasts; the corpus side must not shuffle into
    # a join exchange (BroadcastNestedLoopJoin over a 1-row build side)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_weight_artifact_round_trip(tmp_path, feats):
    from market_data_ingestion_scraper_spark.operators.classifier import (
        load_quality_weights,
        save_quality_weights,
    )

    w = fit_lr(feats, n_iter=10)
    p = str(tmp_path / "w.json")
    save_quality_weights(w, p, meta={"n_iter": 10})
    assert load_quality_weights(p) == w


def test_weight_artifact_schema_mismatch_raises(tmp_path):
    import json

    from market_data_ingestion_scraper_spark.operators.classifier import (
        load_quality_weights,
    )

    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump(
            {"kind": "linear-quality", "feature_cols": ["x_other"],
             "weights": [1.0]},
            f,
        )
    with pytest.raises(ValueError, match="feature schema mismatch"):
        load_quality_weights(p)
    with open(p, "w") as f:
        json.dump({"kind": "something-else", "weights": []}, f)
    with pytest.raises(ValueError, match="not a linear-quality"):
        load_quality_weights(p)
