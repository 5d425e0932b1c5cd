"""Record linkage / entity resolution (extension X18): blocked fuzzy
matching with Fellegi-Sunter-style log-odds scoring.

A training-data pipeline constantly reconciles records that SHOULD be
one entity but aren't byte-equal — product listings scraped from
different pages, author/source records with formatting drift, near-equal
catalog rows.  The published framework (Fellegi & Sunter 1969) runs in
three relational stages, each of which maps to one Spark primitive:

1. **Blocking** — only compare record pairs sharing a cheap exact key
   (here ``(p_brand, p_size)``): one equi-self-join whose fan-out is
   Σ C(|block|, 2), bounded by the blocking key's cardinality profile,
   never |records|².  A skewed block is an AQE skew-join case; a
   pathological key (one giant block) is detectable up front with one
   groupBy count.
2. **Agreement vector** — per candidate pair, a small fixed set of field
   comparators: exact equality, numeric proximity, and set-overlap
   (token Jaccard) — all built-in column expressions, no UDFs.
3. **Score + decision** — the Fellegi-Sunter match weight: each field
   contributes a fixed agree/disagree log-odds weight; the sum is
   thresholded into match / possible / non_match.  Weights are integer
   milli-units so the score — and the decision boundary — is exact at
   any parallelism and in a SQL oracle.

Scale shape: the only shuffles are the blocking join (hash-partitioned
on the blocking key) and the attribute re-joins (key-partitioned on the
record id); tokens are compared via ``array_intersect`` on per-row
DISTINCT token arrays carried on the row — no token-level explode ever
reaches a shuffle.  At 100 TB the blocking index (key → ids) is the
artifact a production linkage pipeline writes out and reuses per
increment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fellegi-Sunter field weights in integer milli-units (agree, disagree):
#: log-odds-shaped constants — a field whose agreement is rare among
#: non-matches (the name tokens) earns more than one that agrees often
#: by chance (type: 6 values).
WEIGHTS_M = {
    "name": (4000, -2000),
    "type": (1500, -500),
    "price": (800, -300),
}
MATCH_M = 5000  #: score ≥ → ``match``
POSSIBLE_M = 1500  #: score ≥ → ``possible`` (else ``non_match``)


def _tokens(col: str) -> F.Column:
    """Sorted distinct lowercase name tokens — the set the Jaccard
    comparator runs on (sorted so the carried array is deterministic)."""
    return F.array_sort(
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(col)), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        )
    )


def record_side(part: DataFrame, id_col: str = "p_partkey") -> DataFrame:
    """One comparison side: (rid, bk1, bk2, toks, ptype, price_m) — the
    blocking key, the distinct-token array, and the milli-unit price,
    all per-row projections (stream-legal; shared by the batch self-join
    and the streaming admission filter)."""
    return part.select(
        F.col(id_col).alias("rid"),
        F.col("p_brand").alias("bk1"),
        F.col("p_size").alias("bk2"),
        _tokens("p_name").alias("toks"),
        F.col("p_type").alias("ptype"),
        F.round(F.col("p_retailprice").cast("double") * 1000)
        .cast("long")
        .alias("price_m"),
    )


def pair_score_cols(
    name_jaccard_min: float = 0.5, price_tol: float = 50.0
) -> dict[str, F.Column]:
    """The per-pair agreement vector + Fellegi-Sunter score over two
    :func:`record_side` aliases ``a`` and ``b`` — the single source of
    the comparator arithmetic for every consumer (batch pair join,
    streaming admission)."""
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    name_jac = F.when(union > 0, inter / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    jac_m = F.round(name_jac * 1e6).cast("long")  # exact comparator operand
    name_agree = jac_m >= F.lit(int(round(name_jaccard_min * 1e6)))
    type_agree = F.col("a.ptype") == F.col("b.ptype")
    price_close = F.abs(F.col("a.price_m") - F.col("b.price_m")) <= F.lit(
        int(round(price_tol * 1000))
    )
    score = (
        F.when(name_agree, F.lit(WEIGHTS_M["name"][0])).otherwise(
            F.lit(WEIGHTS_M["name"][1])
        )
        + F.when(type_agree, F.lit(WEIGHTS_M["type"][0])).otherwise(
            F.lit(WEIGHTS_M["type"][1])
        )
        + F.when(price_close, F.lit(WEIGHTS_M["price"][0])).otherwise(
            F.lit(WEIGHTS_M["price"][1])
        )
    ).cast("long")
    return {
        "name_jac": F.round(name_jac, 6),
        "name_agree": name_agree,
        "type_agree": type_agree,
        "price_close": price_close,
        "score_m": score,
    }


def linked_record_pairs(
    part: DataFrame,
    name_jaccard_min: float = 0.5,
    price_tol: float = 50.0,
    id_col: str = "p_partkey",
    max_block: int | None = None,
) -> DataFrame:
    """(id_a, id_b, name_jac, name_agree, type_agree, price_close,
    score_m, decision) for every blocked candidate pair, id_a < id_b.

    Exactness discipline: Jaccard is computed from integer intersection /
    union counts of distinct token sets (round 6dp at the end); the
    price comparator snaps both prices to milli-units before the
    difference so the tolerance test is integer; the score is an int64
    sum of literal milli-weights — every column is bit-reproducible in
    the DuckDB twin.

    ``max_block`` is the oversized-block guard blocking NEEDS at scale:
    a blocking key whose cardinality does not grow with the data (here
    brand × size = 1 250 values forever) means block sizes — and the
    Σ C(|block|, 2) fan-out — grow LINEARLY-then-QUADRATICALLY with the
    corpus.  The standard production move (Christen 2012's survey of
    indexing techniques) is to exclude (or re-block on a finer key)
    blocks above a size cap and report them: with the cap, fan-out is
    bounded by n_blocks · C(max_block, 2) regardless of corpus size,
    and the excluded blocks are exactly :func:`block_profile`'s top
    rows, so nothing is silently dropped.  ``None`` (default) keeps the
    uncapped demo semantics the gate oracle mirrors."""
    recs = record_side(part, id_col)
    if max_block is not None:
        ok = (
            recs.groupBy("bk1", "bk2")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_block)
            .select("bk1", "bk2")
        )
        # one extra key-bounded aggregation + a slim semi-join; the
        # excluded keys are block_profile's > max_block rows
        recs = recs.join(ok, ["bk1", "bk2"], "left_semi")
    a, b = recs.alias("a"), recs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bk1") == F.col("b.bk1"))
        & (F.col("a.bk2") == F.col("b.bk2"))
        & (F.col("a.rid") < F.col("b.rid")),
    )
    sc = pair_score_cols(name_jaccard_min, price_tol)
    score = sc["score_m"]
    return pairs.select(
        F.col("a.rid").alias("id_a"),
        F.col("b.rid").alias("id_b"),
        sc["name_jac"].alias("name_jac"),
        sc["name_agree"].alias("name_agree"),
        sc["type_agree"].alias("type_agree"),
        sc["price_close"].alias("price_close"),
        score.alias("score_m"),
        F.when(score >= MATCH_M, F.lit("match"))
        .when(score >= POSSIBLE_M, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("decision"),
    )


def linkage_summary(pairs: DataFrame) -> DataFrame:
    """(decision, n_pairs, avg_score_m) — the linkage quality dashboard
    row per decision class (one tiny post-join aggregation)."""
    return (
        pairs.groupBy("decision")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("score_m").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_score_m"),
        )
        .orderBy("decision")
    )


def block_profile(part: DataFrame) -> DataFrame:
    """(bk1, bk2, n_records, n_pairs) per block — the up-front skew probe
    a production run checks BEFORE launching the pair join (one groupBy;
    a block whose C(n,2) dwarfs the rest is the salting/AQE signal)."""
    n = F.count(F.lit(1))
    return (
        part.groupBy(
            F.col("p_brand").alias("bk1"), F.col("p_size").alias("bk2")
        )
        .agg(
            n.alias("n_records"),
            (n * (n - 1) / 2).cast("long").alias("n_pairs"),
        )
    )


def entity_ids(
    part: DataFrame,
    id_col: str = "p_partkey",
    max_block: int | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """(rid, entity_id): canonical entity assignment — the end of the
    entity-resolution pipeline.  Pairs whose Fellegi-Sunter decision is
    ``match`` form an undirected "same entity" graph; connected
    components (the SAME min-label propagation machinery the near-dup
    clustering family uses — one edge-bounded join per round, plan depth
    O(1) via checkpoints) collapse transitive matches, and every record
    keeps its own id as a singleton entity otherwise.  entity_id =
    smallest member rid, deterministic at any parallelism."""
    from .dedup import _propagate_components

    pairs = (
        linked_record_pairs(part, id_col=id_col, max_block=max_block)
        .filter(F.col("decision") == "match")
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    comp = _propagate_components(pairs, max_iter).select(
        F.col("id").alias("rid"), F.col("label").alias("entity_id")
    )
    all_ids = part.select(F.col(id_col).alias("rid"))
    return all_ids.join(comp, "rid", "left").select(
        "rid", F.coalesce("entity_id", "rid").alias("entity_id")
    )
