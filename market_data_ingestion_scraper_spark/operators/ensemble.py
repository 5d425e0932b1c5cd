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


#: sidecar filename for the persisted ensemble artifact directory
QUALITY_SIDECAR = "_quality.json"


def write_quality_artifacts(
    documents: DataFrame,
    path: str,
    label_threshold: float = 0.6,
    lr: float = 1.0,
) -> dict:
    """Fit the frozen ensemble on a reference corpus and persist it as
    one artifact directory (the `write_minhash_index` lifecycle shape):

    - ``weights/``  — the 1-row LR weight frame
      (:func:`~.classifier.gradient_step_weights`),
    - ``lp/``       — the unigram LM relation
      (:func:`~.text.unigram_lp_table`, vocabulary-bounded),
    - ``cutoffs/``  — per-language perplexity tercile cutoffs
      (:func:`~.text.ppl_tercile_cutoffs`, |langs| rows),
    - ``_quality.json`` — the authoritative parameter sidecar
      (label_threshold / lr / fitted sizes), written LAST so a crashed
      fit reads as absent, never as a half-written artifact.

    Returns the sidecar dict.  Serving never re-types parameters: pass
    the loaded frames to
    :func:`~..streaming.pipeline.stream_quality_tag` (or CLI
    ``quality-tag``)."""
    import json
    import os

    from ..util import require_local_path
    from .classifier import classifier_features, gradient_step_weights
    from .text import ppl_tercile_cutoffs, quality_features, unigram_lp_table

    require_local_path(path)
    # a REFIT must first invalidate the old sidecar: the sidecar is the
    # only thing load_quality_artifacts trusts, so a refit that crashes
    # mid-way must read as ABSENT, never as the old sidecar blessing a
    # mix of new and old frames (r16 review finding)
    stale = os.path.join(path, QUALITY_SIDECAR)
    if os.path.exists(stale):
        os.remove(stale)
    feats = classifier_features(
        quality_features(documents), label_threshold=label_threshold
    )
    gradient_step_weights(feats, lr=lr).write.mode("overwrite").parquet(
        os.path.join(path, "weights")
    )
    spark = documents.sparkSession
    # validate each frozen frame as it lands (reading back the 1-row /
    # footer-only parquet is free): a degenerate corpus — all-NULL LR
    # weights from an empty feature frame, an empty LM vocabulary, no
    # language cutoffs — must fail HERE at the fit, not later at serve
    # time with an error pointing back at this function (r16 advice)
    w_rows = spark.read.parquet(os.path.join(path, "weights")).collect()
    if len(w_rows) != 1 or any(v is None for v in w_rows[0].asDict().values()):
        raise ValueError(
            "degenerate quality-ensemble fit: the LR weight frame must be "
            f"exactly 1 non-NULL row, got {w_rows!r} — empty or "
            "single-class corpus?  No sidecar written; the artifact "
            "directory reads as absent."
        )
    unigram_lp_table(documents).write.mode("overwrite").parquet(
        os.path.join(path, "lp")
    )
    # score the cutoffs against the JUST-PERSISTED LM instead of
    # re-deriving it — halves the fit's corpus text scans (r16 review
    # finding; the unigram_logprob docstring's persist-once pattern)
    lp_frozen = spark.read.parquet(os.path.join(path, "lp"))
    n_terms = lp_frozen.count()
    if n_terms == 0:
        raise ValueError(
            "degenerate quality-ensemble fit: empty unigram LM vocabulary "
            "(no tokens in the fit corpus).  No sidecar written."
        )
    ppl_tercile_cutoffs(documents, lp_table=lp_frozen).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "cutoffs"))
    n_langs = spark.read.parquet(os.path.join(path, "cutoffs")).count()
    if n_langs == 0:
        raise ValueError(
            "degenerate quality-ensemble fit: no per-language perplexity "
            "cutoffs (no scoreable documents).  No sidecar written."
        )
    sidecar = {
        "kind": "quality-ensemble",
        "label_threshold": float(label_threshold),
        "lr": float(lr),
        "n_terms": n_terms,
        "n_langs": n_langs,
    }
    with open(os.path.join(path, QUALITY_SIDECAR), "w") as f:
        json.dump(sidecar, f)
    return sidecar


def load_quality_artifacts(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """(weights, lp_table, cutoffs, sidecar) from a
    :func:`write_quality_artifacts` directory.  Refuses a directory
    without the sidecar (a crashed fit or a foreign layout) or with the
    wrong kind — serving against half-written artifacts silently
    mis-votes every document."""
    import json
    import os

    from ..util import require_local_path

    require_local_path(path)
    sidecar_path = os.path.join(path, QUALITY_SIDECAR)
    if not os.path.exists(sidecar_path):
        raise ValueError(
            f"no {QUALITY_SIDECAR} in {path!r} — not a quality-ensemble "
            "artifact directory (crashed fit? foreign layout?)"
        )
    with open(sidecar_path) as f:
        sidecar = json.load(f)
    if sidecar.get("kind") != "quality-ensemble":
        raise ValueError(
            f"artifact kind mismatch: expected quality-ensemble, got "
            f"{sidecar.get('kind')!r}"
        )
    return (
        spark.read.parquet(os.path.join(path, "weights")),
        spark.read.parquet(os.path.join(path, "lp")),
        spark.read.parquet(os.path.join(path, "cutoffs")),
        sidecar,
    )


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

    # the slim per-doc feature projection feeds TWO consumers — the
    # 1-row weights aggregate and the scoring projection — and Catalyst
    # would inline the whole tokenize+featurize subtree into each;
    # persist one generation so the corpus is featurized once per call
    feats = _persist_generation(
        "quality_ensemble.feats",
        classifier_features(
            quality_features(documents), label_threshold=label_threshold
        ),
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
