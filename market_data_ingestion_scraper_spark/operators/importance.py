"""Importance resampling for domain-targeted data selection (DSIR — Xie
et al. 2023, "Data Selection for Language Models via Importance
Resampling", NeurIPS — public).  SURVEY.md §2.11 training-pipeline
extension X20, a sibling of dedup/similarity/quality: given a RAW pool
and a small TARGET corpus (the domain you want more of — DSIR's canonical
run selects web text that "looks like Wikipedia"), estimate per-document
importance weights log p_target(x)/p_raw(x) under hashed n-gram bag
models and sample the pool proportionally (Gumbel top-k — sampling
without replacement ∝ exp(weight/T), Vieira 2014, public).

The reference scraper has no data-selection stage (it ingests everything
it scrapes); this family exists for the 100 TB training-data pipeline the
engine targets, same footing as X1-X19.

Shape (matches the paper):
- features: unigrams + bigrams hashed into ``n_buckets`` counts
  ("hashed n-gram generative model", DSIR §3).  Bigrams derive
  SHUFFLE-FREE from the token array (``arrays_zip`` of two slices — the
  ``bigram_logprob`` idiom), so featurization is a per-row projection.
- two smoothed categorical bucket models (add-``alpha``), fit with one
  vocabulary-bounded groupBy each (map-side combine; ≤ ``n_buckets``
  rows out — broadcastable by construction).
- per-doc weight: Σ_b c_b(x)·(log p_T[b] − log p_R[b]).  Log-probs snap
  to int64 micro-units FIRST (the house pattern), so the weighted sum is
  exact integer arithmetic — partitioning-independent and bit-equal to
  the DuckDB oracle.
- selection: deterministic seeded Gumbel keys from the portable md5 hash
  (engine-reproducible uniforms), ``orderBy(key).limit(k)`` —
  TakeOrderedAndProject, no global sort.

Scale notes (100 TB): featurization is embarrassingly parallel; the only
corpus-sized shuffle is the per-(doc, bucket) count (bounded above by the
explode, map-side combined within each doc's partition slice).  Both
model tables are ≤ n_buckets rows — broadcast joins, never a shuffle of
the corpus against the model.  Selection is a top-k reduce.  The target
corpus is small by definition (DSIR's premise), so its fit is trivial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _persist_generation,
    portable_token_hash,
    portable_uniform,
)
from .text import tokens

__all__ = [
    "hashed_ngram_buckets",
    "fit_bucket_model",
    "importance_weights",
    "dsir_select",
    "fit_dsir_model",
    "save_dsir_model",
    "load_dsir_model",
    "score_with_literal_model",
]


def _feature_array(text: Column) -> Column:
    """Unigram + bigram feature strings from one document, shuffle-free.
    Bigrams join consecutive tokens with a single space; docs with < 2
    tokens contribute unigrams only; null/empty text yields no features
    (explode of an empty array — identical to the oracle's unnest)."""
    t = tokens(text)
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.arrays_zip(
                F.slice(t, 1, n - 1).alias("a"),
                F.slice(t, 2, n - 1).alias("b"),
            ),
            lambda p: F.concat(p["a"], F.lit(" "), p["b"]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bigrams)


def hashed_ngram_buckets(
    documents: DataFrame,
    n_buckets: int = 4096,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Per-document hashed n-gram counts: ``(id_col, bucket, cnt)``.

    ``portable=True`` buckets via :func:`portable_token_hash` (md5-based,
    reproducible bit-for-bit in the DuckDB oracle); the default is
    ``xxhash64`` — the throughput path (one JVM hash per feature
    occurrence, no md5 hex round-trip).
    """
    feat = documents.select(
        F.col(id_col),
        F.explode(_feature_array(F.col(text_col))).alias("_f"),
    )
    if portable:
        bucket = F.pmod(portable_token_hash(F.col("_f")), F.lit(n_buckets))
    else:
        bucket = F.pmod(F.xxhash64("_f"), F.lit(n_buckets))
    return (
        feat.select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_bucket_model(
    bucket_counts: DataFrame, n_buckets: int, alpha: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """Fit an add-``alpha``-smoothed categorical over buckets from
    per-doc counts.  Returns ``(model, floor)``:

    - ``model``: ``(bucket, lp_micro)`` for OBSERVED buckets —
      ``round(ln((c_b + alpha) / (total + alpha·n_buckets)) · 1e6)`` as
      int64 micro-units; ≤ n_buckets rows, broadcastable.
    - ``floor``: ONE row ``(lp0_micro,)`` — the shared smoothed log-prob
      of every unobserved bucket (``c_b = 0``).  Cross-join + coalesce at
      scoring time; keeping it relational avoids a driver-side collect in
      the plan-building path.
    """
    agg = bucket_counts.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("c")
    )
    total = agg.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("_tot"))
    denom = F.col("_tot").cast("double") + float(alpha) * n_buckets
    model = (
        agg.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.round(F.log((F.col("c") + float(alpha)) / denom) * 1e6)
            .cast("long")
            .alias("lp_micro"),
        )
    )
    floor = total.select(
        F.round(F.log(float(alpha) / denom) * 1e6).cast("long").alias("lp0_micro")
    )
    return model, floor


def importance_weights(
    pool: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    *,
    portable: bool = False,
) -> DataFrame:
    """Per-pool-document DSIR importance weight:
    ``(doc_id, n_feats, lw_micro, logratio)`` where ``lw_micro`` is the
    exact int64 micro-unit value of Σ c_b·(lp_target[b] − lp_raw[b]) and
    ``logratio`` its round-6 double.  Documents with zero features (null
    or empty text) produce no row — they carry no evidence either way.

    Both models broadcast (≤ n_buckets rows); the two one-row floors
    cross-join.  The raw model is fit on the POOL itself (DSIR §3), so
    the raw coalesce never fires in practice — it exists so the operator
    also accepts a pre-fit raw model over a superset corpus.
    """
    # The pool featurization feeds BOTH the raw-model fit and the scoring
    # join, so this ONE plan evaluates it twice.  Measured A/B (sf0.1):
    # persisting it wins at low parallelism (local[8]: 2.7 vs 3.0 s) but
    # LOSES at high parallelism (local[32]: 3.3 vs 1.8 s) — the persist
    # barrier + block-manager round trip costs more than the pipelined
    # recompute.  Single-plan scoring therefore recomputes; a production
    # 100 TB run (where two extra corpus scans dwarf any barrier) should
    # fit the model ONCE via fit_dsir_model — whose multi-action fit does
    # persist — and serve with score_with_literal_model.
    pool_feats = hashed_ngram_buckets(pool, n_buckets, portable=portable)
    tgt_feats = hashed_ngram_buckets(target, n_buckets, portable=portable)
    raw_model, raw_floor = fit_bucket_model(pool_feats, n_buckets, alpha)
    tgt_model, tgt_floor = fit_bucket_model(tgt_feats, n_buckets, alpha)
    t = tgt_model.select("bucket", F.col("lp_micro").alias("_lpt"))
    r = raw_model.select("bucket", F.col("lp_micro").alias("_lpr"))
    scored = (
        pool_feats.join(F.broadcast(t), "bucket", "left")
        .join(F.broadcast(r), "bucket", "left")
        .crossJoin(F.broadcast(tgt_floor.select(F.col("lp0_micro").alias("_ft"))))
        .crossJoin(F.broadcast(raw_floor.select(F.col("lp0_micro").alias("_fr"))))
        .select(
            "doc_id",
            "cnt",
            (
                F.col("cnt")
                * (F.coalesce("_lpt", "_ft") - F.coalesce("_lpr", "_fr"))
            ).alias("_contrib"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_feats"),
        F.sum("_contrib").cast("long").alias("lw_micro"),
    )
    return per_doc.select(
        "doc_id",
        "n_feats",
        "lw_micro",
        F.round(F.col("lw_micro") / 1e6, 6).alias("logratio"),
    )


def dsir_select(
    pool: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    temperature: float = 1.0,
    seed: str = "dsir",
    *,
    portable: bool = False,
) -> DataFrame:
    """Gumbel top-k importance resampling: select ``k`` pool documents
    without replacement with probability ∝ exp(logratio / temperature).

    Deterministic across engines and partitionings: the uniform for each
    document derives from the portable md5 hash of ``seed ':' doc_id``
    (``u = (h+1)/(HASH_P+1) ∈ (0,1)``), the Gumbel noise
    ``g = −ln(−ln(u))`` snaps to micro-units, and for the default
    ``temperature=1.0`` the key is the EXACT integer sum
    ``lw_micro + g_micro`` (general temperatures round ``lw_micro/T`` to
    the nearest micro-unit first).  Ties (astronomically unlikely across
    distinct micro keys) break on doc_id.  ``orderBy(...).limit(k)``
    compiles to TakeOrderedAndProject — a per-partition heap + k-row
    reduce, never a global sort.

    Returns ``(doc_id, n_feats, logratio, key)`` — ``key`` is the Gumbel
    key in round-6 units so the selection is auditable.
    """
    w = importance_weights(
        pool, target, n_buckets, alpha, portable=portable
    )
    u = portable_uniform(str(seed), F.col("doc_id"))
    g_micro = F.round(-F.log(-F.log(u)) * 1e6).cast("long")
    if float(temperature) == 1.0:
        scaled = F.col("lw_micro")
    else:
        scaled = F.round(F.col("lw_micro") / float(temperature)).cast("long")
    keyed = w.select(
        "doc_id",
        "n_feats",
        "logratio",
        (scaled + g_micro).alias("_key_micro"),
    )
    return (
        keyed.orderBy(F.col("_key_micro").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "n_feats",
            "logratio",
            F.round(F.col("_key_micro") / 1e6, 6).alias("key"),
        )
    )


# ---------------------------------------------------------------- lifecycle
#
# Fit once offline, serve anywhere: the fitted model is TWO ≤ n_buckets
# log-prob tables, which collapse to ONE ≤ n_buckets delta map
# (lpt − lpr per bucket).  That is small enough to fold into the plan as
# a literal map (the PQ/IVF plan-literal precedent), making serving a
# STATELESS per-row projection — identical in batch and Structured
# Streaming (no explode, no join, no aggregation state).

MODEL_KIND = "dsir-hashed-ngram"


def fit_dsir_model(
    pool: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    *,
    portable: bool = False,
) -> dict:
    """Materialize the DSIR model driver-side: per-bucket int64
    micro-unit delta ``lp_target − lp_raw`` for every bucket observed in
    EITHER corpus, plus the floor delta for never-observed buckets.
    The collect is bounded by ``2 · n_buckets`` rows — the same bounded
    pattern as IVF centroids and PQ codebooks.  Scoring with this model
    is bit-equal to :func:`importance_weights` on the same corpora
    (pytest-pinned)."""
    # Four driver actions (two head(), two collect()) consume these
    # subtrees, and each model's broadcast-total crossJoin re-reads its
    # featurization — persist both so the expensive explode+hash pass
    # over each corpus runs once (same reason as importance_weights).
    pool_feats = _persist_generation(
        "dsir_fit_pool_feats",
        hashed_ngram_buckets(pool, n_buckets, portable=portable),
    )
    tgt_feats = _persist_generation(
        "dsir_fit_tgt_feats",
        hashed_ngram_buckets(target, n_buckets, portable=portable),
    )
    raw_model, raw_floor = fit_bucket_model(pool_feats, n_buckets, alpha)
    tgt_model, tgt_floor = fit_bucket_model(tgt_feats, n_buckets, alpha)
    ft = int(tgt_floor.head()[0])
    fr = int(raw_floor.head()[0])
    t = {int(r["bucket"]): int(r["lp_micro"]) for r in tgt_model.collect()}
    r = {int(r["bucket"]): int(r["lp_micro"]) for r in raw_model.collect()}
    delta = {
        b: t.get(b, ft) - r.get(b, fr) for b in sorted(set(t) | set(r))
    }
    return {
        "kind": MODEL_KIND,
        "n_buckets": int(n_buckets),
        "alpha": float(alpha),
        "portable": bool(portable),
        "floor_delta_micro": ft - fr,
        "delta_micro": delta,
    }


def save_dsir_model(model: dict, path: str, meta: dict | None = None) -> None:
    """Persist a fitted model as a JSON artifact — the `_quantizer.json`
    lesson: serving derives its parameters (bucket count, hash family)
    from the artifact, never from caller memory."""
    import json

    if model.get("kind") != MODEL_KIND:
        raise ValueError(f"not a {MODEL_KIND} model: {model.get('kind')!r}")
    doc = dict(model)
    # JSON objects key on strings; keep buckets sorted for diffability
    doc["delta_micro"] = {
        str(k): int(v) for k, v in sorted(model["delta_micro"].items())
    }
    if meta:
        doc["meta"] = dict(meta)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)


def load_dsir_model(path: str) -> dict:
    """Load a `save_dsir_model` artifact, validating kind and shape —
    scoring with a model fitted under a different hash family or bucket
    count is silent garbage, so mismatch raises."""
    import json

    with open(path) as f:
        doc = json.load(f)
    if doc.get("kind") != MODEL_KIND:
        raise ValueError(f"not a {MODEL_KIND} artifact: {doc.get('kind')!r}")
    for key in ("n_buckets", "portable", "floor_delta_micro", "delta_micro"):
        if key not in doc:
            raise ValueError(f"artifact missing {key!r}")
    b = int(doc["n_buckets"])
    delta = {int(k): int(v) for k, v in doc["delta_micro"].items()}
    bad = [k for k in delta if not (0 <= k < b)]
    if bad:
        raise ValueError(f"bucket ids outside [0, {b}): {sorted(bad)[:5]}")
    doc["delta_micro"] = delta
    return doc


def score_with_literal_model(
    documents: DataFrame, model: dict, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Score documents against a fitted model as a stateless per-row
    projection: the ≤ n_buckets delta map folds into the plan as a
    LITERAL (the PQ/IVF plan-literal precedent), each feature does one
    map lookup, and the per-row sum runs in exact int64 micro-units —
    bit-equal to the relational :func:`importance_weights` fit+score on
    the model's own corpora.  No explode, no join, no shuffle: legal in
    Structured Streaming at any rate.

    Documents whose text yields no features (null/empty) score NULL —
    callers decide the policy (the streaming filter drops them, matching
    `stream_quality_filter`).  Returns
    ``(doc_id, *keep, n_feats, lw_micro, logratio)``."""
    if model.get("kind") != MODEL_KIND:
        raise ValueError(f"not a {MODEL_KIND} model: {model.get('kind')!r}")
    n_buckets = int(model["n_buckets"])
    delta = model["delta_micro"]
    keys = sorted(delta)
    lit_map = F.map_from_arrays(
        F.array(*[F.lit(int(k)) for k in keys]),
        F.array(*[F.lit(int(delta[k])) for k in keys]),
    )
    floor = F.lit(int(model["floor_delta_micro"]))

    def bucket(f: Column) -> Column:
        if model["portable"]:
            return F.pmod(portable_token_hash(f), F.lit(n_buckets))
        return F.pmod(F.xxhash64(f), F.lit(n_buckets))

    feats = _feature_array(F.col("text"))
    staged = documents.select(
        "doc_id", *keep, feats.alias("_f")
    ).withColumn(
        "_lw",
        F.aggregate(
            F.col("_f"),
            F.lit(0).cast("long"),
            lambda acc, f: acc
            + F.coalesce(F.element_at(lit_map, bucket(f)), floor),
        ),
    )
    return staged.select(
        "doc_id",
        *keep,
        F.when(F.size("_f") > 0, F.size("_f")).cast("long").alias("n_feats"),
        F.when(F.size("_f") > 0, F.col("_lw")).alias("lw_micro"),
        F.when(F.size("_f") > 0, F.round(F.col("_lw") / 1e6, 6)).alias(
            "logratio"
        ),
    )
