"""X35 quality_ensemble: the composed plan must decompose EXACTLY into
the three independently-tested voters — any drift between the ensemble
and its parts is a silent curation-policy change."""

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.ensemble import (
    quality_ensemble,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_ensemble_decomposes_into_the_three_voters(spark):
    docs = _docs(spark)
    out = {r["doc_id"]: r for r in quality_ensemble(docs).collect()}
    assert len(out) == docs.count()

    from market_data_ingestion_scraper_spark.operators.classifier import (
        classifier_features,
        gradient_step_weights,
        logit_scores,
    )
    from market_data_ingestion_scraper_spark.operators.text import (
        gopher_rules,
        ppl_score_buckets,
        quality_features,
        unigram_logprob,
    )

    feats = classifier_features(quality_features(docs), label_threshold=0.6)
    clf = {
        r["doc_id"]: (r["logit"], int(r["keep"]))
        for r in logit_scores(feats, gradient_step_weights(feats)).collect()
    }
    gop = {
        r["doc_id"]: r["keep"] for r in gopher_rules(docs).collect()
    }
    scored = docs.select("doc_id", "lang").join(
        unigram_logprob(docs).select("doc_id", "avg_logprob"), "doc_id"
    )
    bucket_map = {
        (r["lang"], r["avg_logprob"]): r["ppl_bucket"]
        for r in ppl_score_buckets(scored).collect()
    }
    doc_bucket = {
        r["doc_id"]: bucket_map.get((r["lang"], r["avg_logprob"]), "tail")
        for r in scored.collect()
    }
    for doc_id, r in out.items():
        want_bucket = doc_bucket.get(doc_id, "tail")
        want_clf_logit, want_clf_vote = clf[doc_id]
        want_ppl = int(want_bucket != "tail")
        want_votes = want_clf_vote + want_ppl + gop[doc_id]
        assert (
            r["logit"], r["clf_vote"], r["ppl_bucket"], r["ppl_vote"],
            r["gopher_vote"], r["votes"], r["keep"],
        ) == (
            want_clf_logit, want_clf_vote, want_bucket, want_ppl,
            gop[doc_id], want_votes, want_votes >= 2,
        ), doc_id
    # the fixture corpus must actually exercise disagreement between
    # voters, or the majority logic is untested
    assert {r["votes"] for r in out.values()} - {0, 3}, "no split votes"


def test_ensemble_min_votes_and_edges(spark):
    docs = _docs(spark)
    strict = quality_ensemble(docs, min_votes=3)
    loose = quality_ensemble(docs, min_votes=1)
    s = {r["doc_id"]: r["keep"] for r in strict.collect()}
    l = {r["doc_id"]: r["keep"] for r in loose.collect()}
    base = {r["doc_id"]: r["keep"] for r in quality_ensemble(docs).collect()}
    for d in base:
        assert s[d] <= base[d] <= l[d]  # monotone in the threshold
    with pytest.raises(ValueError, match="min_votes"):
        quality_ensemble(docs, min_votes=0)
    # unscoreable docs get DEFINITE verdicts: token-less docs vote
    # tail/0 on the ppl side instead of vanishing, and NULL-text docs
    # vote 0 everywhere with keep=False instead of NULL (r16 review
    # finding: a NULL keep slips through both branches of a filter)
    edge = spark.createDataFrame(
        [(1, "", "en"), (2, "!!!", "en"), (3, None, "en")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r for r in quality_ensemble(edge).collect()}
    assert len(got) == 3
    for d in (1, 2, 3):
        assert got[d]["ppl_bucket"] == "tail" and got[d]["ppl_vote"] == 0
    assert got[3]["clf_vote"] == 0 and got[3]["gopher_vote"] == 0
    assert got[3]["votes"] == 0 and got[3]["keep"] is False
    assert got[3]["logit"] is None  # observability stays NULL


def test_ensemble_partitioning_invariant(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, quality_ensemble(docs).collect()))
    b = sorted(map(tuple, quality_ensemble(docs.repartition(7)).collect()))
    assert a == b


# ------------------------------------------------- frozen-artifact serve


def _artifacts(spark, docs):
    from market_data_ingestion_scraper_spark.operators.classifier import (
        classifier_features,
        gradient_step_weights,
    )
    from market_data_ingestion_scraper_spark.operators.text import (
        ppl_tercile_cutoffs,
        quality_features,
        unigram_lp_table,
    )

    feats = classifier_features(quality_features(docs), label_threshold=0.6)
    return (
        gradient_step_weights(feats),
        unigram_lp_table(docs),
        ppl_tercile_cutoffs(docs),
    )


def test_stream_quality_tag_matches_batch_ensemble(spark, tmp_path):
    """The frozen-artifact serve must reproduce quality_ensemble
    bit-for-bit on the reference corpus it was fit on — literal weights
    ≡ broadcast weights, map-literal LM ≡ scoring join, cutoff
    comparison ≡ histogram bucket join — both as a batch frame and as a
    real stream through the memory sink."""
    from market_data_ingestion_scraper_spark.streaming import pipeline as P

    docs = _docs(spark)
    weights, lp, cuts = _artifacts(spark, docs)
    want = {tuple(r) for r in quality_ensemble(docs).collect()}
    got = {
        tuple(r)
        for r in P.stream_quality_tag(docs, weights, lp, cuts).collect()
    }
    assert got == want

    src = str(tmp_path / "qdocs")
    docs.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = P.run_to_memory(
        P.stream_quality_tag(stream, weights, lp, cuts),
        "t_quality_tag",
        spark,
        mode="append",
    )
    assert {tuple(r) for r in out.collect()} == want


def test_stream_quality_tag_oov_and_unknown_lang_policy(spark):
    """Foreign traffic: OOV terms score the artifact's minimum lp_micro
    (rarest-known proxy — conservative), unknown languages and
    token-less docs read tail; both still get definite verdicts."""
    from market_data_ingestion_scraper_spark.streaming import pipeline as P

    ref = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon alpha beta", "en"),
         (2, "alpha alpha beta something else entirely here", "en"),
         (3, "gamma delta epsilon zeta eta theta iota", "en")],
        "doc_id long, text string, lang string",
    )
    weights, lp, cuts = _artifacts(spark, ref)
    foreign = spark.createDataFrame(
        [(10, "totally unseen vocabulary everywhere", "en"),
         (11, "alpha beta gamma", "xx"),   # unknown lang
         (12, "", "en")],                   # token-less
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r
        for r in P.stream_quality_tag(foreign, weights, lp, cuts).collect()
    }
    assert len(got) == 3
    assert got[11]["ppl_bucket"] == "tail" and got[11]["ppl_vote"] == 0
    assert got[12]["ppl_bucket"] == "tail" and got[12]["ppl_vote"] == 0
    # all-OOV doc scores exactly the floor: avg lp == min lp_micro/1e6,
    # which is the reference corpus's rarest word — by construction that
    # score sits at or below every bucketed score, so it reads tail
    # unless the whole reference distribution is flat
    assert got[10]["ppl_bucket"] in ("head", "middle", "tail")
    for d in (10, 11, 12):
        assert got[d]["keep"] is not None and got[d]["votes"] is not None


def test_stream_quality_tag_validation(spark):
    from market_data_ingestion_scraper_spark.streaming import pipeline as P

    docs = _docs(spark)
    weights, lp, cuts = _artifacts(spark, docs)
    with pytest.raises(ValueError, match="min_votes"):
        P.stream_quality_tag(docs, weights, lp, cuts, min_votes=0)
    with pytest.raises(ValueError, match="1-row"):
        P.stream_quality_tag(docs, weights.unionAll(weights), lp, cuts)
    with pytest.raises(ValueError, match="empty lp_table"):
        P.stream_quality_tag(docs, weights, lp.limit(0), cuts)
    with pytest.raises(ValueError, match="max_literal_terms"):
        P.stream_quality_tag(docs, weights, lp, cuts, max_literal_terms=2)
    with pytest.raises(ValueError, match="cutoffs"):
        P.stream_quality_tag(docs, weights, lp, cuts.limit(0))


def test_quality_artifact_lifecycle(spark, tmp_path):
    """fit → persist → load → serve: the artifact round-trip reproduces
    the in-memory frozen serve exactly, and loading refuses foreign or
    half-written directories."""
    from market_data_ingestion_scraper_spark.operators.ensemble import (
        load_quality_artifacts,
        write_quality_artifacts,
    )
    from market_data_ingestion_scraper_spark.streaming import pipeline as P

    docs = _docs(spark)
    path = str(tmp_path / "qart")
    side = write_quality_artifacts(docs, path)
    assert side["kind"] == "quality-ensemble" and side["n_terms"] > 0
    weights, lp, cuts, side2 = load_quality_artifacts(spark, path)
    assert side2 == side
    want = {tuple(r) for r in quality_ensemble(docs).collect()}
    got = {
        tuple(r)
        for r in P.stream_quality_tag(docs, weights, lp, cuts).collect()
    }
    assert got == want
    # refusals: missing sidecar, wrong kind
    import json
    import os

    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    with pytest.raises(ValueError, match="_quality.json"):
        load_quality_artifacts(spark, bare)
    with open(os.path.join(bare, "_quality.json"), "w") as f:
        json.dump({"kind": "lsh"}, f)
    with pytest.raises(ValueError, match="kind mismatch"):
        load_quality_artifacts(spark, bare)


def test_quality_fit_refuses_degenerate_corpus(spark, tmp_path):
    """A degenerate fit corpus must fail AT THE FIT (r16 advice): an
    empty / single-class / token-free corpus used to persist NULL
    weights or an empty lp under a blessing sidecar, and the corruption
    only surfaced at serve time.  Now the fit raises before writing the
    sidecar, so the directory reads as absent to every loader."""
    import os

    from market_data_ingestion_scraper_spark.operators.ensemble import (
        QUALITY_SIDECAR,
        load_quality_artifacts,
        write_quality_artifacts,
    )

    # single-class corpus: every doc scores on the same side of the
    # label threshold, so the LR gradient step yields NULL/degenerate
    # weights (no class contrast to fit)
    docs = spark.createDataFrame(
        [(1, "", "en"), (2, "", "en")], "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "degen")
    with pytest.raises(ValueError, match="degenerate quality-ensemble fit"):
        write_quality_artifacts(docs, path)
    # the refusal left no sidecar: the directory reads as absent
    assert not os.path.exists(os.path.join(path, QUALITY_SIDECAR))
    with pytest.raises(ValueError, match=QUALITY_SIDECAR):
        load_quality_artifacts(spark, path)
