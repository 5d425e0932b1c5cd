"""Gold-layer writer: file-layout-aware parquet output.

At 100 TB the difference between a good and bad table layout is most of the
read cost.  This writer encodes the defaults that matter:

- **partitionBy** on the pruning keys (query filters become directory
  pruning);
- **sortWithinPartitions** on the secondary keys — parquet row-group
  min/max statistics then let scans skip row groups inside each file
  (poor man's z-order for one sort dimension);
- **zstd** compression (better ratio than default snappy at comparable
  scan cost);
- **target file count** per partition via repartition on the partition
  keys, avoiding the many-small-files problem that kills metadata-bound
  listings at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_gold(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    sort_within: tuple[str, ...] = (),
    files_per_partition: int = 1,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    out = df
    if partition_by:
        out = out.repartition(files_per_partition, *partition_by)
    elif files_per_partition:
        # repartition, not coalesce: coalesce can only reduce partitions
        out = out.repartition(files_per_partition)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def zorder_key(cols: dict[str, tuple[float, float]], bits: int = 12):
    """Z-order (Morton) interleave key over normalized numeric columns —
    multi-dimensional locality in ONE sort key, so parquet row-group
    min/max stats prune scans on EVERY participating dimension, not just
    the first sort column (`sortWithinPartitions` alone gives the poor
    man's single-dimension version; this is the k-dimension one).

    ``cols`` maps column name → (min, max) from a prior one-pass agg: each
    value is scaled to a ``bits``-bit integer grid, then bit i of column j
    lands at position ``i*k + j`` of the key.  Pure built-in shift/mask
    arithmetic — whole-stage codegen, no UDF; min/max normalization is
    one cheap pre-pass (quantile-based bucketing would resist skew better
    but needs an approxQuantile pass; documented trade).
    """
    from pyspark.sql import functions as F

    k = len(cols)
    if bits * k > 63:
        # Java shiftleft masks the shift count mod 64: positions >= 64
        # would wrap onto low bits and the additive combine would carry
        # across dimensions — silently aliasing distant grid cells
        raise ValueError(
            f"z-order key needs {bits * k} bits for {k} columns x {bits} "
            f"bits; max 63 — lower bits (<= {63 // k}) or drop columns"
        )
    grid = (1 << bits) - 1
    scaled = []
    for name, (lo, hi) in cols.items():
        span = (hi - lo) or 1.0
        s = F.least(
            F.lit(grid),
            F.greatest(
                F.lit(0),
                ((F.col(name).cast("double") - F.lit(float(lo)))
                 / F.lit(float(span)) * F.lit(grid)).cast("long"),
            ),
        )
        scaled.append(s)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def write_gold_zordered(
    df: DataFrame,
    path: str,
    zorder_by: tuple[str, ...],
    bits: int = 12,
    n_files: int = 1,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Gold writer with z-order clustering: one agg pass for per-column
    min/max, range-repartition + sort on the interleaved key (so both the
    file boundaries AND the row groups inside each file are z-clustered),
    key dropped before write.  Queries filtering any subset of
    ``zorder_by`` skip files/row groups via parquet statistics."""
    from pyspark.sql import functions as F

    bits = min(bits, 63 // max(len(zorder_by), 1))  # keep the key in 63 bits
    row = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in zorder_by],
        *[F.max(c).alias(f"_hi_{c}") for c in zorder_by],
    ).collect()[0]
    if any(row[f"_lo_{c}"] is None for c in zorder_by):
        # empty input (or all-null z column): nothing to cluster
        df.write.mode(mode).option("compression", compression).parquet(path)
        return
    ranges = {
        c: (float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"])) for c in zorder_by
    }
    out = (
        df.withColumn("_z", zorder_key(ranges, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode(mode).option("compression", compression).parquet(path)
