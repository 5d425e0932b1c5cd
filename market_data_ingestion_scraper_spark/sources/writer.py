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
    return _interleave(scaled, bits)


def _interleave(scaled: list, bits: int):
    """Morton-interleave k ``bits``-wide integer grid columns: bit i of
    column j lands at key position i*k + j.  Shared by the min/max and
    quantile grids — the key layout is identical, only the per-column
    value→cell mapping differs."""
    from pyspark.sql import functions as F

    k = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def zorder_key_quantile(
    bounds: dict[str, list[float]], bits: int = 8
):
    """Z-order key over QUANTILE-bucketed columns — the skew-resistant
    grid.  Min/max normalization collapses under skew: one outlier
    stretches the range so the bulk of the data lands in a single grid
    cell and files stop bounding the hot region.  Here each column's cell
    is its quantile bucket (``bounds[c]`` = 2^bits - 1 interior cut
    points from one ``approxQuantile`` pass), so cells hold ~equal row
    counts BY CONSTRUCTION regardless of the value distribution.

    The bucket lookup is ``size(filter(boundaries, b -> b <= x))`` over a
    bound literal array — O(2^bits) codegen'd comparisons per row, which
    is why the quantile grid defaults to 8 bits (256 cells/dim; file- and
    row-group-level clustering needs far fewer cells than values).
    Repeated cut points (heavy ties) merge cells harmlessly — the key
    stays monotone in the underlying value."""
    from pyspark.sql import functions as F

    if bits * len(bounds) > 63:
        raise ValueError(
            f"z-order key needs {bits * len(bounds)} bits; max 63"
        )
    grid = (1 << bits) - 1
    scaled = []
    for name, cuts in bounds.items():
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        bucket = F.size(
            F.filter(arr, lambda b: b <= F.col(name).cast("double"))
        ).cast("long")
        scaled.append(F.least(F.lit(grid).cast("long"), bucket))
    return _interleave(scaled, bits)


def write_gold_zordered(
    df: DataFrame,
    path: str,
    zorder_by: tuple[str, ...],
    bits: int = 12,
    n_files: int = 1,
    compression: str = "zstd",
    mode: str = "overwrite",
    grid: str = "minmax",
) -> None:
    """Gold writer with z-order clustering: one pre-pass for the grid
    (per-column min/max, or quantile cut points with ``grid="quantile"``),
    range-repartition + sort on the interleaved key (so both the file
    boundaries AND the row groups inside each file are z-clustered), key
    dropped before write.  Queries filtering any subset of ``zorder_by``
    skip files/row groups via parquet statistics.

    ``grid="quantile"`` trades a slightly costlier pre-pass
    (``approxQuantile``) and per-row bucket lookup for skew resistance:
    cells hold ~equal row counts whatever the distribution, so a
    heavy-tailed column still yields near-disjoint per-file value ranges
    on the hot region (min/max normalization would put ~all rows in one
    cell there and bound nothing)."""
    from pyspark.sql import functions as F

    if grid == "quantile":
        bits = min(bits, 8, 63 // max(len(zorder_by), 1))
        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        cast = df.select(
            *[F.col(c).cast("double").alias(c) for c in zorder_by]
        )
        cuts = dict(
            zip(zorder_by, cast.approxQuantile(list(zorder_by), probs, 0.001))
        )
        if any(not c for c in cuts.values()):
            # empty input (or all-null z column): nothing to cluster
            df.write.mode(mode).option("compression", compression).parquet(path)
            return
        key = zorder_key_quantile(cuts, bits)
    else:
        bits = min(bits, 63 // max(len(zorder_by), 1))  # keep key in 63 bits
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
        key = zorder_key(ranges, bits)
    out = (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode(mode).option("compression", compression).parquet(path)
