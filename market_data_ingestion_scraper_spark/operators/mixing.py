"""Dataset-mixing operators for training pipelines: source composition
reporting (the input to mixture reweighting), deterministic sharded
training-order assignment, and a quality-filter funnel report.

All three are exact relational transforms with DuckDB oracle twins.
Cross-engine hashing constraint (r02 gate finding): DuckDB ``SUM(int)``
and ``count_if`` return HUGEINT, which pandas/Arrow-side canonicalization
turns into float64/decimal128 while Spark emits int64 — so every integer
aggregate in the oracle SQL must be ``CAST(... AS BIGINT)``, and shares
are derived from exact integer micro-units (the ``(2a+b) DIV 2b`` half-up
identity) rather than ``round()`` on a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def source_mix(documents: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-source corpus composition: document and token counts plus each
    source's share of the total — the table a mixture-reweighting step
    (e.g. DoReMi-style or hand-tuned sampling ratios) consumes.

    One grouped aggregate (shuffle on the source key, map-side combined),
    then grand totals via an unpartitioned window over the PER-SOURCE rows.
    The global window is safe by construction: its input is post-aggregation
    cardinality (one row per source — thousands at worst), the same bounded
    pattern as ``analytics.indexed_dimension``.  The alternative (aggregate
    to one row and join it back) would evaluate the per-source subtree
    twice — two full corpus scans at 100 TB — because a broadcast side is
    not a reused exchange.

    Shares are computed in exact integer arithmetic: ppm via the
    ``(2a+b) DIV 2b`` half-up identity (operands non-negative by
    construction; the DECIMAL(38,0) widening keeps ``n_tokens * 2e6``
    exact at any corpus size), then one final ``ppm / 1e6`` double
    division — a single identical IEEE op on both engines."""
    per_source = documents.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    totals = per_source.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.sum("n_docs").over(w).alias("tot_docs"),
        F.sum("n_tokens").over(w).alias("tot_tokens"),
    )
    doc_ppm = F.expr(
        "(CAST(n_docs AS DECIMAL(38,0)) * 2000000 + tot_docs) DIV (2 * tot_docs)"
    )
    tok_ppm = F.expr(
        "(CAST(n_tokens AS DECIMAL(38,0)) * 2000000 + tot_tokens)"
        " DIV (2 * tot_tokens)"
    )
    return totals.select(
        source_col,
        "n_docs",
        "n_tokens",
        (doc_ppm / F.lit(1000000.0)).alias("doc_share"),
        (tok_ppm / F.lit(1000000.0)).alias("token_share"),
    )


def training_order(
    documents: DataFrame,
    n_shards: int = 8,
    salt: str = "epoch-0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for training: assign each document a
    (shard, position) so readers stream shards independently in a
    reproducible pseudo-random order.  Changing ``salt`` (e.g. per epoch)
    redraws the permutation; the same salt always reproduces it — the
    order is a pure function of the data, like
    :mod:`~..operators.sampling`.

    Portability: shard and rank both derive from ``md5(salt || id)``;
    shard uses ascii arithmetic on the first two hex chars (``ascii`` and
    ``md5`` exist in every engine — no bigint hex parsing), rank is a
    per-shard row_number over (digest, id).  One window per shard: the
    shuffle key is the shard, state is a running counter — exactly
    n_shards-way parallel at any corpus size."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary"))
    shard = F.pmod(
        F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1)),
        F.lit(n_shards),
    )
    d = documents.select(F.col(id_col), h.alias("h"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return d.select(
        id_col, "shard", F.row_number().over(w).alias("pos")
    )


def quality_funnel(
    documents: DataFrame,
    min_chars: int = 100,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_tokens: int = 20,
) -> DataFrame:
    """Filter-funnel report: how many documents survive each cumulative
    curation stage (non-empty -> length floor -> language whitelist ->
    token floor).  The observability table every production data pipeline
    keeps next to its filters — per-stage attrition makes silent
    over-filtering visible.

    One aggregate pass over the corpus (conditional counts, map-side
    combined into a single row), then an unpivot of that row into
    (stage, n_in, n_survive) — no per-stage rescans."""
    p1 = F.length("text") > 0
    p2 = p1 & (F.col("n_chars") >= min_chars)
    p3 = p2 & F.col("lang").isin(*langs)
    p4 = p3 & (F.size(tokens("text")) >= min_tokens)
    row = documents.agg(
        F.count(F.lit(1)).alias("s0"),
        F.count_if(p1).alias("s1"),
        F.count_if(p2).alias("s2"),
        F.count_if(p3).alias("s3"),
        F.count_if(p4).alias("s4"),
    )
    stages = ["non_empty", "min_chars", "lang_whitelist", "min_tokens"]
    stack_args = ", ".join(
        f"{i + 1}, '{name}', s{i}, s{i + 1}" for i, name in enumerate(stages)
    )
    return row.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage_idx, stage, n_in, n_survive)"
    ).withColumn("n_dropped", F.col("n_in") - F.col("n_survive"))
