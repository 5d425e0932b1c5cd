"""Graph centrality over relational edge lists (extension X17): PageRank
as iterative DataFrame algebra.

A training-data pipeline meets graphs constantly — link graphs for crawl
prioritization and spam scoring (the original PageRank use), citation /
co-occurrence graphs for source weighting, user-item graphs for
popularity priors.  The published algorithm (Brin & Page 1998; the
MapReduce formulation is textbook) is a power iteration:

    r'(v) = (1-d)/N + d · Σ_{u→v} r(u) / outdeg(u)

Spark-first shape: each iteration is ONE equi-join (ranks → edges on
src, outdegree pre-joined once) + ONE groupBy(dst) sum — the classic
"contributions" MapReduce round as two shuffles, both map-side combined,
both bounded by the EDGE list.  No vertex-program framework needed:
the edge list is a DataFrame, ranks are a DataFrame, and the loop drives
plan construction on the driver while all data stays distributed.

Determinism for the oracle gate: ranks are exact int64 micro-units of a
fixed total mass — contributions use integer division (`div`), the
damping mix is integer arithmetic, and every sum is an int64 sum —
so the fixpoint trajectory is bit-identical at any parallelism and in a
DuckDB twin (unrolled one CTE per iteration; positive-operand `div`
equals DuckDB `//`).  Mass lost to integer truncation and to dangling
nodes (no out-edges) is NOT redistributed — the classic simplification,
identical on both sides by construction.

Scale notes: state per iteration is one (node, rank) row per vertex —
the smallest possible; the join shuffles edges × 1 ranks rows with
map-side combine on the contribution sum.  The rank frame is
localCheckpoint-ed every ``checkpoint_every`` iterations (plan depth
stays O(1), same pattern as the connected-components loop in
operators.dedup) and the previous generation's blocks are released
explicitly.  Skewed in-degree (a mega-hub page) is an AQE skew-join
case; outdeg is bounded by nodes and broadcasts when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total rank mass in micro-units: Σ ranks ≈ 10¹² (minus truncation loss)
TOTAL_MASS_M = 10**12


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank_m) after ``n_iter`` exact-integer power iterations
    over the distinct directed edge list.  ``damping_pct`` is the
    integer-percent damping factor (85 ≡ the canonical d=0.85).

    The node set is src ∪ dst; every node starts at mass//N.  One driver
    scalar (the node count) is collected up front — the same bounded
    fit-step pattern as the ANN quantizers; everything else is
    distributed."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct {damping_pct} not a percentage")
    from .dedup import _release_checkpoint

    # nodes and the outdegree-joined edge list are LOOP INVARIANTS read
    # every iteration: materialize them once (at 100 TB these are the
    # persisted graph artifacts — the edge list with outdegree IS the
    # adjacency index a link-graph pipeline writes out), instead of
    # re-running the upstream joins/distincts n_iter times.  The
    # distinct edge list itself feeds BOTH invariants (nodes and
    # out_edges) — checkpoint it first so the upstream join + distinct
    # runs once, not once per invariant (r18: the two eager builds each
    # re-ran the full edge derivation).
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # scalar: one number to the driver

    def _detach(result: DataFrame) -> DataFrame:
        # early returns: materialize the (tiny) result, then release the
        # nodes checkpoint it was derived from — without this the
        # long-running-driver discipline the loop path follows leaks one
        # nodes-sized checkpoint per degenerate call (r10 review)
        result = result.localCheckpoint(eager=True)
        _release_checkpoint(nodes)
        _release_checkpoint(e)
        return result

    if n_nodes == 0:
        return _detach(nodes.withColumn("rank_m", F.lit(0).cast("long")))
    unit = TOTAL_MASS_M // n_nodes
    teleport = ((100 - damping_pct) * unit) // 100  # exact, loop-invariant
    if n_iter <= 0:
        return _detach(
            nodes.select("node", F.lit(unit).cast("long").alias("rank_m"))
        )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # contributions only need (src, rank) for nodes WITH out-edges;
    # pre-join outdegree once so the loop joins a single slim relation
    out_edges = e.join(outdeg, "src").localCheckpoint(eager=True)
    # both invariants are materialized — the raw edge checkpoint's
    # blocks are dead weight for the rest of the loop
    _release_checkpoint(e)

    ranks = nodes.select("node", F.lit(unit).cast("long").alias("rank_m"))
    prev = None
    for i in range(n_iter):
        contrib = (
            out_edges.join(ranks, out_edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_m div od").alias("c_m"),
            )
            .groupBy("node")
            .agg(F.sum("c_m").alias("in_m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({damping_pct} * coalesce(in_m, 0L)) div 100"
                )
            ).cast("long").alias("rank_m"),
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
            if prev is not None:
                _release_checkpoint(prev)
            prev = ranks
    # final ranks are materialized (the last iteration always
    # checkpoints) — release the loop invariants' blocks deterministically
    _release_checkpoint(out_edges)
    _release_checkpoint(nodes)
    return ranks


def top_ranked(ranks: DataFrame, k: int = 20) -> DataFrame:
    """(node, rank_m, rnk): global top-k by rank (ties → lower node id)
    via TakeOrderedAndProject, then ranked under a constant partition
    key over the k survivors (bounded_window — a literal key would fold
    back to the empty spec)."""
    from ..functions import bounded_window

    topk = ranks.orderBy(F.desc("rank_m"), F.asc("node")).limit(k)
    w = bounded_window("node", F.desc("rank_m"), F.asc("node"))
    return topk.withColumn(
        "rnk", F.row_number().over(w).cast("int")
    ).select("node", "rank_m", "rnk")
