"""Time-series similarity search over the events stream (extension X15).

Motivated by the distributed time-series similarity literature (e.g.
"Time Series Similarity Search for Streaming Data in Distributed
Systems", EDBT 2019): find entities whose metric HISTORY looks alike —
users with the same spending rhythm, commodities with the same seasonal
price shape — where per-point equality is meaningless and amplitude/offset
must not matter.

Spark-first composition instead of a bespoke engine:

1. ``user_value_series`` — one grouped pass turns raw events into a
   fixed-length per-user vector: bucket timestamps onto a day grid,
   average per bucket, assemble a dense array (missing buckets → 0).
2. ``znormalize_series`` — the classic z-normalization (subtract mean,
   divide by std, per series) that makes similarity amplitude- and
   offset-invariant; a pure higher-order projection.
3. ``series_topk_similar`` — the normalized vectors ARE embeddings, so
   top-k search is the EXISTING ANN family: brute-force cosine for exact
   results, or ``lsh_topk``/``ivf_topk`` (pass the vectors as the
   corpus) when the entity count makes exact search quadratic.

Scale shape: step 1 is one groupBy(user) with map-side combine (the
shuffle carries (user, bucket, partial-sum) — bounded by users × grid,
never raw events); steps 2-3 add no new shuffle beyond the chosen
search's own.  The grid length is a constant (vector width), so state
per group is fixed.  At 100 TB of events this is exactly the
events-to-embedding projection a feature store would run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def user_value_series(
    events: DataFrame,
    n_days: int = 30,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(id, series: array<double>) — per-user daily mean value on a fixed
    ``n_days`` grid anchored at the corpus min date (deterministic; no
    wall-clock).  Days with no events are 0.0, matching the "no activity"
    semantics of a usage series.  One aggregation pass: the shuffle
    carries (user, day, sum, count) partials, bounded by users × grid.

    The daily mean uses the house exact-aggregation pattern (per-row
    DECIMAL cast, one double division at the end) instead of ``avg`` so
    the series — and everything downstream of it — is independent of
    partitioning/summation order and bit-reproducible in a SQL oracle."""
    anchor = events.select(F.min(F.col(ts_col).cast("date")).alias("d0"))
    day = F.datediff(F.col(ts_col).cast("date"), F.col("d0"))
    per_day = (
        events.join(F.broadcast(anchor))
        .filter((day >= 0) & (day < n_days))
        .groupBy(F.col(id_col), day.alias("_day"))
        .agg(
            (
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
                / F.count(value_col)
            ).alias("_avg")
        )
    )
    # dense grid assembly: sorted sparse (day, avg) pairs -> fixed array
    pairs = per_day.groupBy(id_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_day", "_avg")))
        ).alias("_m")
    )
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(n_days - 1)),
        lambda d: F.coalesce(F.element_at("_m", d), F.lit(0.0)),
    )
    return pairs.select(F.col(id_col), grid.alias("series"))


def znormalize_series(series: Column | str = "series") -> Column:
    """Z-normalize one series per row: (x - mean) / std, constant series →
    all-zero (guarded std).  Pure higher-order arithmetic — per-row,
    shuffle-free, and scale/offset invariant by construction: the classic
    preprocessing that makes cosine-on-series behave like correlation.

    ``mean`` and ``std`` are let-bound (single-element ``transform`` —
    the house `_let` pattern): Catalyst inlines repeated expression
    references TEXTUALLY, so the naive form re-evaluates the mean fold
    inside every element of the variance fold and the output transform —
    a multiplicative expression blowup that showed up as seconds of
    planning/codegen per composed consumer (r10: series_topk_similar
    spent most of its 5 s there).  Let-binding keeps the tree linear;
    the float arithmetic (and thus every oracle hash) is unchanged."""
    from .dedup import _let

    s = F.col(series) if isinstance(series, str) else series
    n = F.size(s)

    def with_mean(mean: Column) -> Column:
        var = (
            F.aggregate(s, F.lit(0.0), lambda a, x: a + (x - mean) * (x - mean))
            / n
        )

        def with_std(std: Column) -> Column:
            return F.when(
                std <= 1e-12, F.transform(s, lambda x: F.lit(0.0))
            ).otherwise(F.transform(s, lambda x: (x - mean) / std))

        return _let(F.sqrt(var), with_std)

    return _let(F.aggregate(s, F.lit(0.0), lambda a, x: a + x) / n, with_mean)


def subsequence_topk(
    events: DataFrame,
    pattern: list[float],
    k: int = 3,
    n_days: int = 30,
    id_col: str = "user_id",
) -> DataFrame:
    """Sliding-window subsequence search (the UCR-suite / streaming-
    similarity problem shape): find the (user, offset) windows whose
    z-normalized length-w slice best matches a z-normalized query
    pattern — occurrence detection at ANY amplitude/offset, anywhere in
    the series.

    Relational formulation: windows come from one ``posexplode`` over
    start positions (users × (n_days - w + 1) rows — the data expansion
    is the window count, never quadratic in users), each window is
    ``slice`` + the same z-normalization as whole-series search, and the
    match score is cosine against the broadcast-literal normalized
    pattern — all higher-order built-ins, no UDF.  Output:
    (user, start_day, match_cos), global top-k (ties → lower user, then
    earlier start) — a user with several strong occurrences can fill
    several slots.  The single-partition global ranking only ever sees
    k·users rows because each user's top-k reduces in parallel first
    (top-k, not top-1: no more than k windows of one user can reach the
    global top-k, but more than one can)."""
    from .similarity import dot, l2_norm

    w = len(pattern)
    if not 1 <= w <= n_days:
        raise ValueError(f"pattern length {w} not in [1, {n_days}]")
    mean = sum(pattern) / w
    var = sum((x - mean) ** 2 for x in pattern) / w
    std = var**0.5
    if std <= 1e-12:
        raise ValueError("constant pattern matches everything — not a query")
    zp = [(x - mean) / std for x in pattern]
    zp_lit = F.array(*[F.lit(float(x)) for x in zp])
    zp_norm = float(sum(x * x for x in zp)) ** 0.5

    from pyspark.sql.window import Window

    series = user_value_series(events, n_days, id_col=id_col)
    win = series.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_days - w)),
                lambda s: znormalize_series(F.slice("series", s + 1, w)),
            )
        ).alias("start_day", "_zw"),
    )
    zw_norm = l2_norm(F.col("_zw"))
    cos = F.when(zw_norm <= 1e-12, F.lit(0.0)).otherwise(
        dot(F.col("_zw"), zp_lit) / (zw_norm * F.lit(zp_norm))
    )
    scored = win.select(
        F.col(id_col), "start_day", F.round(cos, 6).alias("match_cos")
    )
    # per-user top-k first (parallel — k windows per user suffice, since
    # no more than k of one user's windows can make the global top-k;
    # reducing to top-1 here would silently drop a second same-user
    # occurrence of the pattern), then the tiny k·users global ranking.
    per_user_w = Window.partitionBy(id_col).orderBy(
        F.desc("match_cos"), F.asc("start_day")
    )
    per_user = (
        scored.withColumn("_ur", F.row_number().over(per_user_w))
        .filter(F.col("_ur") <= k)
        .drop("_ur")
    )
    # global top-k via orderBy().limit(k) (TakeOrderedAndProject —
    # distributed reduction over the k·users candidate rows), then rank
    # the k survivors under a constant partition key (no empty-spec
    # WindowExec; the input is k rows by construction).
    topk = per_user.orderBy(
        F.desc("match_cos"), F.asc(id_col), F.asc("start_day")
    ).limit(k)
    order = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("match_cos"), F.asc(id_col), F.asc("start_day")
    )
    return (
        topk.withColumn("rnk", F.row_number().over(order))
        .select(id_col, "start_day", "match_cos", F.col("rnk").cast("int").alias("rnk"))
    )


def series_topk_similar(
    events: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_days: int = 30,
    id_col: str = "user_id",
) -> DataFrame:
    """Exact top-k most-similar users by z-normalized series cosine
    (≡ Pearson correlation of the raw series).  The normalized vectors
    feed :func:`similarity.brute_force_topk` unchanged — swap in
    ``lsh_topk``/``ivf_topk`` with the same vectors when the entity count
    demands sub-quadratic search (the series table IS an embeddings
    table).

    Constant series (every in-window day identical — in practice, a user
    whose only activity nets to the 0.0 fill) z-normalize to the zero
    vector; correlation is undefined for them, so they are excluded from
    both the query and corpus sides rather than fed into a 0/0 cosine."""
    from .similarity import brute_force_topk

    vecs = user_value_series(events, n_days, id_col=id_col).select(
        F.col(id_col).alias("vec_id"), znormalize_series().alias("embedding")
    )
    # No lineage cut needed (r10): with `mean`/`std` let-bound inside
    # znormalize_series the composed plan (zero-norm filter + cosine)
    # stays linear — the r8 localCheckpoint here was working around the
    # expression blowup at its symptom (42 s of planning), not its cause.
    # Both search sides derive from the same aggregation, so Spark's
    # exchange reuse serves the corpus and query scans from one shuffle.
    # A production pipeline would still WRITE the series table out as its
    # embedding artifact — that is a sink decision, not a plan necessity.
    vecs = vecs.filter(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0
    )
    q = vecs.filter(F.col("vec_id").isin(query_ids))
    return brute_force_topk(vecs, q, k=k)
