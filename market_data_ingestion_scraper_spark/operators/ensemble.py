"""X35 document-quality ensembler: the three independently-gated
per-document quality voters — the linear classifier
(:mod:`~.classifier`, CCNet/fastText-style), the corpus-LM perplexity
tercile (:func:`~.text.ppl_score_buckets`, Wenzek et al. 2020), and the
Gopher rule gate (:func:`~.text.gopher_rules`, Rae et al. 2021 §A1.1) —
composed as ONE declarative plan with a majority vote, the way
production curation stacks actually decide keep/drop (each signal has a
known blind spot: rules pass fluent spam, the classifier inherits its
weak labels, perplexity favors the LM's own domain — combining them is
the standard mitigation in published corpus pipelines, and
`curation_pipeline` is the house precedent for one-plan composition).

One row per document::

    (doc_id, logit, clf_vote, ppl_bucket, ppl_vote, gopher_vote,
     votes, keep)

- ``clf_vote``    — integer sign test of the one-step LR logit,
- ``ppl_vote``    — 1 iff the document's (lang, score) group is NOT in
  its language's tail tercile (documents with no scoreable tokens read
  'tail': no fluency evidence, the conservative choice),
- ``gopher_vote`` — the composite Gopher rule keep,
- ``keep``        — ``votes >= min_votes`` (default 2-of-3 majority).

Unscoreable documents get a DEFINITE verdict, never a NULL: NULL-text
docs (whose classifier/gopher features are NULL end to end) vote 0 on
every axis and keep = false, so a downstream ``filter(keep)`` /
``filter(~keep)`` pair partitions the corpus exactly — a NULL keep
would slip through both branches (r16 review finding).  ``logit``
stays NULL for them: it is observability, not a vote.

Spark-first shape at 100 TB: the classifier is a 1-row broadcast
aggregate + a scoring projection; the Gopher gate is a pure projection;
the perplexity side is the unigram-LM scan pair (vocabulary-bounded
shuffles) whose slim per-doc (doc_id, lang, avg_logprob) projection is
persisted ONCE and feeds both the bounded histogram window (cardinality
langs × distinct rounded scores — broadcastable) and the per-doc bucket
join-back; everything meets on doc_id-keyed equi-joins.  No corpus-sized
structure reaches the driver.

No reference-repo counterpart (a Selenium market-data scraper — no text
quality surface); built for the LLM-pipeline mission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_ensemble(
    documents: DataFrame,
    min_votes: int = 2,
    label_threshold: float = 0.6,
    lr: float = 1.0,
) -> DataFrame:
    """Majority-vote keep/drop over the three gated quality voters —
    see the module docstring for the contract and scale shape."""
    from .classifier import (
        classifier_features,
        gradient_step_weights,
        logit_scores,
    )
    from .dedup import _persist_generation
    from .text import (
        gopher_rules,
        ppl_score_buckets,
        quality_features,
        unigram_logprob,
    )

    if not 1 <= int(min_votes) <= 3:
        raise ValueError(f"min_votes must be in [1, 3], got {min_votes}")

    feats = classifier_features(
        quality_features(documents), label_threshold=label_threshold
    )
    # NULL-text documents carry NULL classifier/gopher keeps (their
    # features are NULL end to end); coalesce every VOTE to 0 so an
    # unscoreable document gets a definite 0-vote / keep=false verdict
    # instead of a NULL that slips through both branches of a
    # downstream keep filter (r16 review finding).  logit stays NULL —
    # it is observability, not a vote.
    clf = logit_scores(feats, gradient_step_weights(feats, lr=lr)).select(
        "doc_id",
        "logit",
        F.coalesce(F.col("keep").cast("int"), F.lit(0)).alias("clf_vote"),
    )
    gop = gopher_rules(documents).select(
        "doc_id",
        F.coalesce(F.col("keep"), F.lit(0)).alias("gopher_vote"),
    )
    # the slim per-doc score projection feeds TWO branches (the bucket
    # histogram and the per-doc join-back) — persist one generation so
    # the two-pass unigram LM scores the corpus once, not twice
    scored = _persist_generation(
        "quality_ensemble.scored",
        documents.select("doc_id", "lang").join(
            unigram_logprob(documents).select("doc_id", "avg_logprob"),
            "doc_id",
        ),
    )
    buckets = ppl_score_buckets(scored).select(
        "lang", "avg_logprob", "ppl_bucket"
    )
    per_doc = scored.join(buckets, ["lang", "avg_logprob"], "left").select(
        "doc_id", "ppl_bucket"
    )
    bucket = F.coalesce(F.col("ppl_bucket"), F.lit("tail"))
    ppl_vote = (bucket != "tail").cast("int")
    votes = (F.col("clf_vote") + ppl_vote + F.col("gopher_vote")).cast("int")
    return (
        clf.join(gop, "doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "logit",
            "clf_vote",
            bucket.alias("ppl_bucket"),
            ppl_vote.alias("ppl_vote"),
            "gopher_vote",
            votes.alias("votes"),
            (votes >= int(min_votes)).alias("keep"),
        )
    )
