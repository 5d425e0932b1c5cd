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
