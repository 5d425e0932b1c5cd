"""As-of join and range (interval) join — operators Spark lacks natively,
built as compositions of existing DataFrame ops (preference (a) from the
design brief; no Pandas fallback needed).

**As-of join** (`asof_join`): for each left row, the most recent right row
with ``right.time <= left.time`` within the same key.  Implementation:
union both sides tagged, one window pass per key ordered by (time, side)
carrying the right side's values forward with ``last(ignorenulls)``, then
keep left rows.  Cost: one shuffle on the key + one sort — identical shape
to any windowed aggregation, so it scales like one (state = one group's
carried values; no join explosion, no pandas).  Ties (equal timestamps)
match the right row — DuckDB ``ASOF JOIN``'s inclusive semantics, which the
oracle checks bit-for-bit.

**Interval join** (`interval_join`): match left points to right [lo, hi)
intervals without a full inequality join.  Implementation: bucketize — each
interval explodes to the fixed-width buckets it covers, each point maps to
one bucket; equi-join on bucket then filter the exact predicate.  At scale
the equi-join shuffles on bucket id (hash-partitionable, AQE-skew-safe),
versus the O(n·m) broadcast-nested-loop Spark plans for a raw inequality
join.  Bucket width tunes replication (intervals copy to ~span/width
buckets) against bucket selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: str,
    value_cols: tuple[str, ...],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right ``value_cols``
    with ``right[time_col] <= left[time_col]`` for the same ``by`` key
    (null when no prior right row exists)."""
    carried = [f"{prefix}{c}" for c in value_cols]
    r = right.select(
        F.col(by),
        F.col(time_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
    )
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r.schema[a].dataType).alias(a) for a in carried],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps → inclusive match
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(a, ignorenulls=True).over(w).alias(f"_f_{a}") for a in carried],
    )
    out = filled.filter(F.col("_side") == 1)
    for a in carried:
        out = out.drop(a).withColumnRenamed(f"_f_{a}", a)
    return out.drop("_side")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of left points to right half-open intervals [lo, hi),
    via bucketized equi-join (no cartesian/BNL plan)."""
    lb = left.withColumn("_bucket", F.floor(F.col(point_col) / bucket_width))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                # hi is exclusive: a boundary-aligned hi doesn't reach its bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bucket_width
                ),
            )
        ),
    )
    return (
        lb.join(rb, "_bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bucket")
    )
