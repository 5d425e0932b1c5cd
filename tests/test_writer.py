"""Gold-writer layout tests: partition dirs, file counts, sorted row groups,
compression codec — the properties that matter at scale, checked on disk."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.sources import load_table
from market_data_ingestion_scraper_spark.sources.writer import write_gold


def test_write_gold_layout(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem")
    out = str(tmp_path / "gold")
    write_gold(
        li,
        out,
        partition_by=("l_returnflag",),
        sort_within=("l_shipdate",),
        files_per_partition=1,
    )
    # hive partition dirs exist
    dirs = sorted(p.split("=")[-1] for p in glob.glob(f"{out}/l_returnflag=*"))
    assert dirs == ["A", "N", "R"]
    # one data file per partition
    for d in ("A", "N", "R"):
        files = glob.glob(f"{out}/l_returnflag={d}/*.parquet")
        assert len(files) == 1
        meta = pq.ParquetFile(files[0]).metadata
        # zstd codec actually applied
        assert meta.row_group(0).column(0).compression.lower() == "zstd"
    # sorted within partition → non-overlapping, increasing shipdate stats
    f = glob.glob(f"{out}/l_returnflag=A/*.parquet")[0]
    pf = pq.ParquetFile(f)
    idx = pf.schema_arrow.names.index("l_shipdate")
    mins = [pf.metadata.row_group(i).column(idx).statistics.min
            for i in range(pf.metadata.num_row_groups)]
    assert mins == sorted(mins)
    # readback equals source
    assert spark.read.parquet(out).count() == li.count()


def test_write_gold_unpartitioned_coalesce(spark, sf_smoke, tmp_path):
    part = load_table(spark, sf_smoke, "part")
    out = str(tmp_path / "gold_flat")
    write_gold(part, out, files_per_partition=2)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == 2
    assert spark.read.parquet(out).count() == part.count()


def test_zorder_key_matches_python_morton(spark):
    """Bit-exactness of the interleave against a reference Morton encode
    on an integer grid where normalization is the identity."""
    from market_data_ingestion_scraper_spark.sources.writer import zorder_key

    bits = 4
    grid = (1 << bits) - 1
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.withColumn(
        "z", zorder_key({"x": (0, grid), "y": (0, grid)}, bits=bits)
    ).collect()

    def morton(x, y):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in out:
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered files must bound BOTH dimensions: with 4 range-files
    over a 32x32 grid, a point-filter on either x or y alone touches a
    strict subset of files (per-file min/max spans < full range), which
    is exactly what parquet stats pruning keys off.  A y-sorted layout
    would leave x unbounded in every file."""
    import itertools

    from pyspark.sql import functions as F

    from market_data_ingestion_scraper_spark.sources.writer import (
        write_gold_zordered,
    )

    rows = [(x, y, x * 32 + y) for x, y in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    path = str(tmp_path / "z")
    write_gold_zordered(df, path, zorder_by=("x", "y"), bits=5, n_files=4)
    back = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(back) == 4 and sum(r["n"] for r in back) == 1024
    # every file's bounding box is a proper sub-range in BOTH dims:
    # z-clustering with 4 files splits the grid into quadrant-ish blocks
    for r in back:
        assert (r["x1"] - r["x0"] + 1) * (r["y1"] - r["y0"] + 1) <= 1024 // 2


def test_zorder_key_rejects_bit_overflow(spark):
    """bits*k > 63 would wrap shift counts (Java masks mod 64) and alias
    distant grid cells — must refuse, and the writer must auto-reduce."""
    import pytest as _pytest

    from market_data_ingestion_scraper_spark.sources.writer import (
        write_gold_zordered,
        zorder_key,
    )

    with _pytest.raises(ValueError, match="63"):
        zorder_key({f"c{i}": (0, 1) for i in range(6)}, bits=12)
    # the writer clamps instead of raising: 6 cols -> 10 bits each
    df = spark.range(8).selectExpr(*[f"id as c{i}" for i in range(6)])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        write_gold_zordered(df, f"{d}/z", zorder_by=tuple(f"c{i}" for i in range(6)),
                            bits=12, n_files=2)
        assert spark.read.parquet(f"{d}/z").count() == 8


def test_zorder_quantile_grid_survives_skew(spark, tmp_path):
    """Skew resistance of the quantile grid: one huge outlier stretches
    the min/max range so the WHOLE bulk lands in grid cell 0 — the range
    partitioner cannot split identical keys, so min/max z-ordering
    degenerates to one giant file with full-range value spans (zero
    pruning inside the hot region).  The quantile grid buckets by rank,
    so files stay balanced and bound the hot region regardless of the
    outlier."""
    import random

    from pyspark.sql import functions as F

    from market_data_ingestion_scraper_spark.sources.writer import (
        write_gold_zordered,
    )

    rng = random.Random(7)
    rows = [(rng.randrange(1000), rng.randrange(1000), i) for i in range(4000)]
    rows.append((1_000_000, 1_000_000, 9999))  # outlier stretches both dims
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    def file_stats(path):
        return (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )

    mm = str(tmp_path / "minmax")
    write_gold_zordered(df, mm, zorder_by=("x", "y"), bits=5, n_files=4,
                        grid="minmax")
    qt = str(tmp_path / "quantile")
    write_gold_zordered(df, qt, zorder_by=("x", "y"), bits=5, n_files=4,
                        grid="quantile")

    mm_stats, qt_stats = file_stats(mm), file_stats(qt)
    # min/max grid collapse: the bulk is one unsplittable z cell
    assert max(r["n"] for r in mm_stats) >= 4000, mm_stats
    # quantile grid: balanced files...
    assert max(r["n"] for r in qt_stats) <= 4001 // 2, qt_stats
    assert len(qt_stats) == 4, qt_stats
    # ...and confine the outlier to ONE file: rank bucketing puts x=1e6 in
    # the top grid cell alone, so every other file's parquet x-stats stay
    # bounded by the bulk range — a query on the stretched region prunes
    # ≥3 of 4 files.  (Asserting a count of sub-700-span files here was
    # order-dependent flaky: repartitionByRange's reservoir sample seed
    # varies with session history, shifting exact file boundaries.  The
    # outlier-confinement bound is invariant to where the cuts land.)
    bulk_bounded = [r for r in qt_stats if r["x1"] <= 1000]
    assert len(bulk_bounded) >= 3, qt_stats
