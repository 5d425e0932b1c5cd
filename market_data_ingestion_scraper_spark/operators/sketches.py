"""Mergeable-sketch corpus profiling (X6 at scale) — the incremental
pattern a 100 TB corpus actually needs: compute a fixed-size sketch PER
SHARD (source / day / partition) once, then answer global questions by
MERGING sketches — never by rescanning data.  New shards merge in O(1);
yesterday's sketches never recompute.

Four sketch families, all JVM-side Spark built-ins (Apache DataSketches
/ Spark CountMinSketch):

- HLL     — distinct tokens per shard; union-mergeable for global counts.
- theta   — distinct-token SETS with set algebra: union / intersection /
            difference estimates across shards (e.g. "how many distinct
            tokens do web and books share?" — the cross-source overlap
            view, without materializing either token set).
- KLL     — doc-length quantiles; mergeable, rank-error bounded.
- CMS     — per-term frequency with ε·N overestimate bound; point
            queries served driver-side from the sketch bytes.

The reference profiles nothing (its tables are ~100 rows); these are the
driver-mandated X6 extension (SURVEY §2.11) in mergeable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from .text import tokens


def shard_token_sketches(
    documents: DataFrame,
    shard_col: str = "source",
    cms_eps: float = 0.001,
    cms_confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One row per shard: (shard, n_token_instances, hll_tokens,
    theta_tokens, kll_doc_len, cms_terms).  Each sketch column is bytes
    of fixed size — the shard's profile artifact, persisted alongside
    the data at scale.  One scan, one groupBy on the shard key; the
    shuffle carries partial sketches (KBs), not tokens."""
    from .dedup import _persist_generation

    # tokenization feeds both the token and the length sketch; one cached
    # generation per operator, released by the next call (r10)
    staged = _persist_generation(
        "shard_sketches.toks",
        documents.select(
            F.col(shard_col).alias("shard"), tokens("text").alias("_toks")
        ),
    )
    tok = staged.select("shard", F.explode("_toks").alias("tok"))
    tok_sketches = tok.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_token_instances"),
        F.hll_sketch_agg("tok").alias("hll_tokens"),
        F.theta_sketch_agg("tok").alias("theta_tokens"),
        F.count_min_sketch(
            "tok", F.lit(cms_eps), F.lit(cms_confidence), F.lit(seed)
        ).alias("cms_terms"),
    )
    len_sketches = staged.select(
        "shard", F.size("_toks").cast("long").alias("_n")
    ).groupBy("shard").agg(F.kll_sketch_agg_bigint("_n").alias("kll_doc_len"))
    # LEFT join from the length side: a shard whose documents all
    # tokenize to empty (non-Latin text, pure punctuation) has no token
    # rows but must still appear in the profile — as 0 tokens / N docs,
    # not as a nonexistent shard (review r7 finding)
    return len_sketches.join(tok_sketches, "shard", "left").withColumn(
        "n_token_instances", F.coalesce("n_token_instances", F.lit(0))
    )


def merge_corpus_profile(shard_sketches: DataFrame) -> Row:
    """Global corpus profile from shard sketches ONLY (no data rescan):
    total token instances, distinct-token estimates (HLL and theta —
    two independent estimators of the same quantity, a built-in sanity
    cross-check), and doc-length quantiles from the pairwise-merged KLL.

    The HLL/theta unions are one-row aggregations over KB-sized state;
    KLL merges via the scalar pairwise combiner inside a reduce-style
    aggregate (shard count is small by construction — shards are
    sources/days, not rows)."""
    merged = shard_sketches.agg(
        F.sum("n_token_instances").alias("n_token_instances"),
        F.hll_sketch_estimate(F.hll_union_agg("hll_tokens")).alias(
            "distinct_tokens_hll"
        ),
        F.theta_sketch_estimate(F.theta_union_agg("theta_tokens")).alias(
            "distinct_tokens_theta"
        ),
        F.collect_list("kll_doc_len").alias("_klls"),
    )
    # pairwise-merge the shard KLLs: element 1 seeds the fold, the rest
    # merge in (seeding with element 1 AND folding over it would
    # double-weight shard 1's distribution)
    rest = F.slice(
        F.col("_klls"), 2, F.greatest(F.size("_klls") - 1, F.lit(0))
    )
    merged = merged.select(
        "*",
        F.reduce(
            rest,
            F.element_at("_klls", 1),
            lambda acc, x: F.kll_sketch_merge_bigint(acc, x),
        ).alias("_kll"),
    )
    return merged.select(
        "n_token_instances",
        "distinct_tokens_hll",
        "distinct_tokens_theta",
        F.kll_sketch_get_quantile_bigint(
            "_kll", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("doc_len_quartiles"),
    ).collect()[0]


def shared_distinct_tokens(
    shard_sketches: DataFrame, shard_a: str, shard_b: str
) -> float:
    """Estimated count of distinct tokens PRESENT IN BOTH shards —
    theta-sketch intersection, the cross-source vocabulary-overlap view
    (e.g. boilerplate shared between crawls) computed from two KB-sized
    sketches instead of a token-set join."""
    a = shard_sketches.filter(F.col("shard") == shard_a).select(
        F.col("theta_tokens").alias("ta")
    )
    b = shard_sketches.filter(F.col("shard") == shard_b).select(
        F.col("theta_tokens").alias("tb")
    )
    row = a.crossJoin(b).select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ta"), F.col("tb"))
        ).alias("est")
    ).collect()
    if not row or row[0]["est"] is None:  # missing shard or no tokens
        return 0.0
    return float(row[0]["est"])


def cms_term_counts(shard_sketches: DataFrame, terms: list[str]) -> dict[str, int]:
    """Driver-side point queries against the MERGED count-min sketch:
    estimated corpus-wide instance count per term, with the CMS
    guarantee estimate ∈ [true, true + ε·N] at the configured
    confidence.  Sketches merge via the public Spark CountMinSketch
    class; bytes in, bytes out — no token rescan."""
    rows = shard_sketches.select("cms_terms").collect()
    if not rows:
        return {t: 0 for t in terms}
    jvm = shard_sketches.sparkSession._jvm
    sketch = None
    for r in rows:
        if r["cms_terms"] is None:  # empty-token shard carries no CMS
            continue
        s = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(r["cms_terms"])
        )
        sketch = s if sketch is None else sketch.mergeInPlace(s)
    if sketch is None:
        return {t: 0 for t in terms}
    return {t: int(sketch.estimateCount(t)) for t in terms}
