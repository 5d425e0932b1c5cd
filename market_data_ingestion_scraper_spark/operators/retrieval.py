"""X31 hybrid retrieval fusion — reciprocal-rank fusion of a lexical
(BM25) candidate list and a semantic (exact-cosine) candidate list, the
retrieval shape RAG data pipelines actually serve (Cormack, Clarke &
Buettcher 2009, "Reciprocal rank fusion outperforms Condorcet and
individual rank learning methods", SIGIR — textbook public IR).

Why fusion and not either list alone: BM25 misses paraphrases the
embedding space catches, embeddings miss rare exact terms BM25 nails;
RRF combines the two WITHOUT score calibration, because it consumes only
RANKS — ``score(d) = Σ_lists 1/(k_rrf + rank_list(d))`` — so the two
retrievers' incomparable score scales never meet.

Spark-first shape, and why it scales to 100 TB:

- The heavy lifting lives entirely inside the two already-scale-shaped
  retrievers this operator composes: :func:`~.text.bm25_scores` (the
  token explode filters to the query terms BEFORE aggregating, df/avgdl
  broadcast, TakeOrderedAndProject top-k) and
  :func:`~.similarity.brute_force_topk` (query side broadcast, corpus
  streams through one scan; swap in ``lsh_topk`` / ``ivf_topk`` for the
  same (id, cos_sim, rnk) contract past ~10⁷ vectors).
- The fusion itself only ever touches the two CANDIDATE lists —
  ≤ ``n_candidates`` rows each by construction — so the full-outer join
  and the final top-k are bounded regardless of corpus size.  Nothing
  corpus-sized reaches this stage.
- Determinism for the oracle gate: both input ranks are already
  engine-reproducible (6-dp-rounded scores, ties by id), and the RRF
  score is computed in EXACT INTEGER micro-units —
  ``rrf_micro = Σ 1_000_000_000 DIV (k_rrf + rank)`` — so any engine
  agrees bit-for-bit; final ties break by doc id.

No part of this derives from the reference repo (a Selenium market-data
scraper, /root/reference/main.py — it has no retrieval, no ranking, no
vectors); the operator exists for the training-data/RAG pipeline
mission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import bounded_window

#: integer micro-unit scale for the RRF sum: 1e9 DIV (k+rank) keeps ~7
#: significant digits at the default k_rrf=60 while staying well inside
#: int64 for any plausible list count.
_RRF_SCALE = 1_000_000_000


def _rrf_term(rank_col: str, k_rrf: int):
    """``1e9 DIV (k_rrf + rank)`` as exact int64; 0 when the document is
    absent from this list (null rank) — the standard RRF convention."""
    return F.coalesce(
        F.expr(f"CAST({_RRF_SCALE} AS BIGINT) DIV ({int(k_rrf)} + {rank_col})"),
        F.lit(0).cast("long"),
    )


def rrf_fuse(
    ranked_lists: dict[str, DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse N ranked candidate lists by reciprocal-rank fusion.

    Each value of ``ranked_lists`` is a CANDIDATE-BOUNDED frame carrying
    ``(id_col, rank_col)`` with rank 1-based; a document absent from a
    list simply contributes 0 for it.  Returns
    ``(id_col, <name>_rank ..., rrf_micro)`` ordered by
    ``(rrf_micro DESC, id ASC)`` and limited to ``k`` — compiled to
    TakeOrderedAndProject over the full-outer join of the (tiny) lists.

    Malformed lists REFUSE instead of skewing the fusion (r15 advisor
    findings): a rank that is NULL or < 1 raises in-plan (a 0-based
    list would silently inflate every contribution — 1e9 DIV (k_rrf+0)
    for the top doc — and rank == -k_rrf divides by zero to a silent 0),
    and duplicate ``id_col`` rows within one list raise rather than
    fanning out through the chained full-outer joins as duplicate fused
    rows with arbitrary rank pairing.  Both checks are lazy CASE
    branches over the candidate-bounded lists (the dup check is a
    per-id window count — bounded by the list, never corpus-sized), so
    validation costs no extra job and no corpus-scale work.

    Kept separate from :func:`hybrid_retrieval_rrf` so callers can fuse
    any number of retrievers (BM25 + dense + a recency list, ...) with
    the same exact-integer arithmetic."""
    from pyspark.sql import Window

    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if int(k_rrf) < 1:
        raise ValueError(f"k_rrf must be >= 1, got {k_rrf}")
    names = list(ranked_lists)
    for name in names:
        if not name.isidentifier():
            # the name becomes a <name>_rank output column referenced in
            # a SQL expression — refuse anything that can't be one
            raise ValueError(f"list name must be an identifier: {name!r}")
    per_id = Window.partitionBy(id_col)
    fused: DataFrame | None = None
    for name in names:
        rank = F.col(rank_col).cast("int")
        side = ranked_lists[name].select(
            F.col(id_col),
            F.when(
                rank.isNull() | (rank < 1),
                F.raise_error(F.concat(
                    F.lit(f"rrf_fuse: list {name!r} carries a non-1-based "
                          f"rank ("),
                    F.coalesce(rank.cast("string"), F.lit("NULL")),
                    F.lit(") — ranks must be >= 1"),
                )).cast("int"),
            ).when(
                F.count(F.lit(1)).over(per_id) > 1,
                F.raise_error(F.concat(
                    F.lit(f"rrf_fuse: list {name!r} carries duplicate "
                          f"{id_col} rows (id="),
                    F.col(id_col).cast("string"),
                    F.lit(") — one row per document per list"),
                )).cast("int"),
            ).otherwise(rank).alias(f"{name}_rank"),
        )
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    rrf = None
    for name in names:
        term = _rrf_term(f"{name}_rank", k_rrf)
        rrf = term if rrf is None else rrf + term
    return (
        fused.select(
            id_col,
            *[f"{n}_rank" for n in names],
            rrf.cast("long").alias("rrf_micro"),
        )
        .orderBy(F.desc("rrf_micro"), F.asc(id_col))
        .limit(int(k))
    )


def hybrid_retrieval_rrf_multi(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: DataFrame,
    query_vectors: DataFrame,
    k: int = 10,
    k_rrf: int = 60,
    n_candidates: int = 20,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    text_col: str = "text",
    dl_col: str | None = None,
) -> DataFrame:
    """Hybrid top-k for MANY queries in one plan — the batch-eval / RAG
    serving form of :func:`hybrid_retrieval_rrf` (which takes one
    query).  ``query_terms`` carries (query_id, term) rows — each
    query's lexical side; ``query_vectors`` carries one (vec_id,
    embedding) row per query with ``vec_id`` = the same query_id space
    (the :func:`~.similarity.brute_force_topk` multi-query convention;
    a query's own corpus row is excluded from its semantic candidates,
    exactly like the single-query form).

    Returns ``(query_id, doc_id, lex_rank, sem_rank, bm25, cos_sim,
    rrf_micro)``, the per-query top-``k`` ordered ties by doc_id —
    per query BIT-IDENTICAL to the single-query operator run with that
    query's terms and vector (pytest differential).

    Scale shape: BOTH retrievers amortize across the query batch — one
    corpus token explode semi-joined to the union query vocabulary
    (:func:`~.text.bm25_scores_multi`), one corpus vector scan against
    the broadcast query set; the fusion join and per-query top-k touch
    only candidate rows (≤ 2·n_candidates per query)."""
    from pyspark.sql import Window

    from .similarity import brute_force_topk
    from .text import bm25_scores_multi

    # duplicate query rows would interleave two vectors' scores in one
    # query's rank window — garbage sem_ranks with no error, the exact
    # silent-corruption mode the single-query guard and rrf_fuse refuse
    # (r16 review finding); the query frame is broadcast-sized, so the
    # uniqueness probe is one tiny job
    dup = (
        query_vectors.groupBy(vec_id_col)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"query_vectors carries duplicate {vec_id_col} rows (e.g. "
            f"{dup[0][vec_id_col]}) — one vector per query id"
        )
    # the lexical side needs no such probe: bm25_scores_multi dedupes
    # (query_id, term) IN-PLAN with .distinct() before the vocabulary
    # semi-join, so repeated term rows cannot double-count a term's BM25
    # contribution — that .distinct() is load-bearing for this operator's
    # correctness, not an optimization (r16 review)
    docs_n = documents.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *([F.col(dl_col)] if dl_col else []),
    )
    lex = bm25_scores_multi(
        docs_n, query_terms, top_k=n_candidates, dl_col=dl_col
    ).select(
        "query_id",
        F.col("doc_id").alias(doc_id_col),
        "bm25",
        "lex_rank",
    )
    sem = brute_force_topk(
        embeddings, query_vectors, k=n_candidates,
        id_col=vec_id_col, vec_col=vec_col,
    ).select(
        "query_id",
        F.col("neighbor_id").alias(doc_id_col),
        "cos_sim",
        F.col("rnk").cast("int").alias("sem_rank"),
    )
    fused = lex.join(sem, ["query_id", doc_id_col], "full_outer")
    rrf = _rrf_term("lex_rank", k_rrf) + _rrf_term("sem_rank", k_rrf)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc(doc_id_col)
    )
    return (
        fused.select(
            "query_id",
            doc_id_col,
            "lex_rank",
            "sem_rank",
            "bm25",
            "cos_sim",
            rrf.cast("long").alias("rrf_micro"),
        )
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= int(k))
        .drop("_r")
        # the docstring promises per-query ordered output; the window
        # alone does not guarantee row order after the filter/drop, so
        # finish with the explicit orderBy the single-query form ends
        # with (r16 advice)
        .orderBy("query_id", F.desc("rrf_micro"), F.asc(doc_id_col))
    )


def hybrid_retrieval_rrf(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: tuple[str, ...],
    query_vectors: DataFrame,
    k: int = 10,
    k_rrf: int = 60,
    n_candidates: int = 20,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    text_col: str = "text",
    dl_col: str | None = None,
) -> DataFrame:
    """Hybrid (lexical + semantic) top-k for ONE query: BM25 over
    ``query_terms`` fused with exact cosine top-k for the single query
    vector in ``query_vectors`` (a one-query frame in the
    :func:`~.similarity.brute_force_topk` convention — its id must not
    collide with a corpus id you want retrievable, since ANN serving
    excludes self-matches).  A multi-row query frame refuses loudly:
    the fusion drops the query id, so two queries' ranked lists would
    silently interleave into one garbage fusion (r15 review finding).

    Returns ``(doc_id, lex_rank, sem_rank, bm25, cos_sim, rrf_micro)``
    ordered by ``(rrf_micro DESC, doc_id ASC)``, ``k`` rows; a document
    found by only one retriever carries nulls for the other's columns.

    ``dl_col`` passes through to :func:`~.text.bm25_scores` (the
    gold-layer precomputed token count — one text scan in the whole
    lexical plan)."""
    from .similarity import brute_force_topk
    from .text import bm25_scores

    # The one-query guard's collect doubles as the query-side
    # materialization: the single collected row becomes a LOCAL one-row
    # frame for the semantic side, so the guard costs no scan the main
    # job wasn't already paying (r15 review finding — the original
    # guard added a second pass over the query frame's source).
    qsel = query_vectors.select(vec_id_col, vec_col)
    qrows = qsel.limit(2).collect()
    if len(qrows) != 1:
        raise ValueError(
            "query_vectors must hold exactly one query row — fuse "
            "multi-query lists per query via rrf_fuse instead"
        )
    qlocal = documents.sparkSession.createDataFrame(qrows, qsel.schema)
    # bm25_scores speaks the (doc_id, text) schema — select/alias exactly
    # the needed columns (a rename-in-place collides when the frame also
    # carries a literal 'doc_id'/'text' alongside the custom columns) and
    # alias the ranked output back out, so the advertised column
    # parameters actually function (r15 review findings)
    docs_n = documents.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *([F.col(dl_col)] if dl_col else []),
    )
    lex = bm25_scores(
        docs_n, query_terms, top_k=n_candidates, dl_col=dl_col
    ).withColumnRenamed("doc_id", doc_id_col)
    # rank the ≤ n_candidates BM25 rows: the window is bounded by the
    # candidate list, never corpus-sized (same justification as the
    # source_mix post-aggregation windows)
    lw = bounded_window(doc_id_col, F.desc("bm25"), F.asc(doc_id_col))
    lex = lex.select(
        doc_id_col,
        "bm25",
        F.row_number().over(lw).cast("int").alias("lex_rank"),
    )
    sem = brute_force_topk(
        embeddings, qlocal, k=n_candidates,
        id_col=vec_id_col, vec_col=vec_col,
    ).select(
        F.col("neighbor_id").alias(doc_id_col),
        "cos_sim",
        F.col("rnk").cast("int").alias("sem_rank"),
    )
    fused = lex.join(sem, doc_id_col, "full_outer")
    rrf = _rrf_term("lex_rank", k_rrf) + _rrf_term("sem_rank", k_rrf)
    return (
        fused.select(
            doc_id_col,
            "lex_rank",
            "sem_rank",
            "bm25",
            "cos_sim",
            rrf.cast("long").alias("rrf_micro"),
        )
        .orderBy(F.desc("rrf_micro"), F.asc(doc_id_col))
        .limit(int(k))
    )
